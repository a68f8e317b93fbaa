"""Reusable column-expression libraries (all JVM-side built-ins).

Every function here returns a ``pyspark.sql.Column`` built from built-in
functions so hot paths stay inside WholeStageCodegen; the matching DuckDB
SQL fragments (for the correctness oracle) live next to each helper.
"""

from . import hashing, text, vectors  # noqa: F401
