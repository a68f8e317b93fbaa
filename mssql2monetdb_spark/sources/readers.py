"""Source readers & the reference-compatible CSV sink.

The reference spools extracts to CSV with ``\\N`` nulls, always-quoted
fields and backslash escaping (``CopyTool.java:50,697-730``); our staging is
Parquet (schema+count carried natively), but the CSV conventions are kept as
a compat sink/source for interop with the reference's files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config.spec import CopyJob, SourceSpec
from .jdbc import jdbc_reader

#: Reference CSV conventions (CopyTool.java:50 NULL sentinel; 716-722 escaping)
CSV_OPTIONS = {
    "nullValue": r"\N",
    "quote": '"',
    "escape": "\\",
    "header": "true",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def read_source(spark: SparkSession, source: SourceSpec, job: CopyJob) -> DataFrame:
    """Extract phase: produce the source DataFrame for a copy job.

    File sources: table mode reads ``<path>/<table>.parquet`` (or csv) with
    column pruning pushed to the scan; query mode registers every table file
    in the directory as a temp view and evaluates the SQL natively in Spark
    (the reference ships it verbatim to the source DB —
    ``CopyToolConfig.java:856-867``; we ARE the query engine).
    JDBC sources: partitioned reads via the options builder in ``jdbc.py``.
    """
    mode, payload = job.select_source()
    if source.format == "jdbc":
        return jdbc_reader(spark, source, job)

    if mode == "table":
        table, columns = payload
        df = _read_table_file(spark, source, table)
        if columns:
            df = df.select(*columns)  # projection pushdown (CopyTable.java:314-322)
        return df

    # query mode: register all tables present in the source dir, then spark.sql
    register_source_views(spark, source)
    return spark.sql(payload)


def _read_table_file(spark: SparkSession, source: SourceSpec, table: str) -> DataFrame:
    path = os.path.join(source.path, f"{table}.{source.format}")
    if source.format == "csv":
        return spark.read.options(**CSV_OPTIONS, inferSchema="true").csv(path)
    if source.format == "json":
        return spark.read.json(path)  # JSON-lines
    if source.format == "orc":
        return spark.read.orc(path)
    return spark.read.parquet(path)


def register_source_views(spark: SparkSession, source: SourceSpec) -> None:
    """(Re-)register every table file in a file source dir as a temp view.

    Temp views are session-global and bare-named (the job SQL references bare
    table names, reference ``CopyToolConfig.java:856-867``), so two query-mode
    sources with same-named tables shadow each other. Any SQL evaluated
    against a source (extract query, count_query) must call this immediately
    beforehand so the views it sees are *this* source's.
    """
    if source.format == "jdbc":
        return
    suffix = f".{source.format}"
    for fname in sorted(os.listdir(source.path)):
        if fname.endswith(suffix):
            _read_table_file(spark, source, fname[: -len(suffix)]).createOrReplaceTempView(
                fname[: -len(suffix)]
            )


def write_csv_compat(df: DataFrame, path: str) -> None:
    """Reference-convention CSV sink: ``\\N`` nulls, quoted+escaped fields.

    Spark-internal round-trip surface: Spark's reader matches ``nullValue``
    after unquoting, so the quoted ``"\\N"`` this writer emits for NULL
    reads back as NULL through :data:`CSV_OPTIONS`. It is NOT a bulk-load
    staging format — a server-side COPY parser distinguishes the quoted
    token from the bare one; that path uses
    :func:`..jdbc.monetdb_staged_frame`, which keeps the null token
    unquoted exactly like the reference's serializer."""
    df.write.mode("overwrite").options(**CSV_OPTIONS, quoteAll="true").csv(path)
