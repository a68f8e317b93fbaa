"""Schema verify + evolve (reference op #14, ``MonetDBUtil.java:339-394``).

The reference ALTERs the target to add every source column missing from it;
it never drops or retypes columns (type verification is a declared TODO in
the reference, ``MonetDBUtil.java:367-369`` — we DO verify types and fail
loudly on incompatible changes).

In the versioned-publish model, "evolve" means: the new physical version is
widened to the union of the published schema and the incoming schema, with
columns absent from the incoming frame filled with typed NULLs. Consumers of
the public view never lose a column; new columns appear as they arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """Incompatible type change between published and incoming schema."""


def evolve_to_union(df: DataFrame, published: T.StructType) -> DataFrame:
    """Widen ``df`` to published ∪ incoming.

    - column in both: types must match exactly (else error);
    - column only in published: appended as typed NULL (ALTER ADD analog
      seen from the consumer side — old columns never disappear);
    - column only in incoming: kept (the reference's ADD COLUMN case).

    Column order: published columns first (stable for consumers), then new
    incoming columns in their incoming order.
    """
    incoming = {f.name: f for f in df.schema.fields}
    cols = []
    for f in published.fields:
        if f.name in incoming:
            got = incoming[f.name].dataType
            if got != f.dataType:
                raise SchemaEvolutionError(
                    f"column {f.name!r}: published type {f.dataType.simpleString()} "
                    f"!= incoming {got.simpleString()}; implicit retyping is not allowed"
                )
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    published_names = {f.name for f in published.fields}
    cols += [F.col(f.name) for f in df.schema.fields if f.name not in published_names]
    return df.select(*cols)
