"""JDBC connector parity (reference ops #1-2, #9-11 — SURVEY.md §2A).

The reference runs a single forward-only cursor per table and loads through
a COPY INTO / batched-INSERT fallback chain (``CopyTool.java:829-866``).
Spark replaces both ends:

- reads: ``spark.read.format("jdbc")`` with partitioned scans
  (partitionColumn/lowerBound/upperBound/numPartitions) so a 100 TB source
  table is pulled by many executors in parallel, not one cursor;
- writes: ``df.write.format("jdbc")`` with ``batchsize`` (the reference's
  ``batch.size``, default 10000 — ``CopyToolConfig.java:44``) and
  ``isolationLevel=NONE`` as the analog of LOCKED-mode loads
  (``CopyTool.java:990-991``).

No JDBC server exists in this environment; these builders are exercised by
unit tests on the option dicts and are integration-ready.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from ..config.spec import CopyJob, SourceSpec

DEFAULT_BATCH_SIZE = 10_000  # reference batch.size default (CopyToolConfig.java:44)
DEFAULT_NUM_PARTITIONS = 32


def jdbc_read_options(source: SourceSpec, job: CopyJob) -> dict[str, str]:
    """Build the spark.read.format('jdbc') option map for a copy job.

    Table mode always uses ``dbtable`` — a declared column projection is
    applied as a Spark-side ``.select`` in :func:`jdbc_reader`, which the
    JDBC source compiles into a pruned SELECT with *dialect-quoted*
    identifiers (hand-built ``SELECT a, b FROM t`` strings break on
    case-normalizing databases; CopyTable.java:314-322 is the reference's
    equivalent pushdown).

    A ``partitionColumn`` without declared bounds is allowed in table mode:
    :func:`jdbc_reader` fills the bounds with one pushed
    ``SELECT MIN(c), MAX(c)`` probe (:func:`probe_partition_bounds`) so a
    spec can opt into a parallel scan without hand-probing — the
    reference's single forward cursor is exactly the failure mode this
    prevents at a 100 TB source. Query mode still requires explicit bounds
    (Spark's partitioned read needs ``dbtable``).
    """
    opts = dict(source.options)
    mode, payload = job.select_source()
    if mode == "table":
        opts["dbtable"] = payload[0]
    else:
        opts["query"] = payload
    # partitioned scan when the spec names a partition column
    if "partitionColumn" in opts:
        opts.setdefault("numPartitions", str(DEFAULT_NUM_PARTITIONS))
        if "dbtable" not in opts:
            # Spark requires dbtable (+bounds) for partitioned reads
            raise ValueError("partitionColumn requires table mode")
    opts.setdefault("fetchsize", str(DEFAULT_BATCH_SIZE))
    return opts


#: SQLStates meaning "this identifier does not resolve" — the ONLY failures
#: where retrying a probe with the other identifier casing is sound. Derby
#: 42X04/42X05 (column/table not found), SQL-Server-class 42S22/42S02,
#: PostgreSQL 42703/42P01. A transient error (lock timeout, connection
#: blip) must NOT fall through to the unquoted form: the store would
#: case-normalize it and could silently resolve a DIFFERENT same-named
#: column where both casings exist (ADVICE r10).
IDENTIFIER_SQLSTATES = ("42X04", "42X05", "42S22", "42S02", "42703", "42P01")


def is_identifier_resolution_error(exc: Exception) -> bool:
    """True when the (possibly py4j-wrapped) SQLException is an
    identifier-resolution failure — the exception text carries the
    SQLState for every dialect this engine probes."""
    text = str(exc)
    return any(code in text for code in IDENTIFIER_SQLSTATES)


def probe_partition_bounds(
    spark: SparkSession, options: dict[str, str], table: str, column: str
) -> tuple[object, object]:
    """One pushed ``SELECT MIN(c), MAX(c)`` — the bounds for a
    range-partitioned scan, computed ON the source so exactly one row
    crosses the wire (the same probe shape as the watermark trigger;
    Spark's V1 JDBC relation would otherwise pull the whole column for a
    Spark-side agg). Identifier-case ladder as in ``probe_max_jdbc``:
    quoted first (Spark-written case-exact columns), then bare
    (store-case-normalized). Returns ``(None, None)`` only when the table
    is empty."""
    import logging

    log = logging.getLogger(__name__)
    base = {
        k: v
        for k, v in options.items()
        if k
        not in (
            "dbtable",
            "query",
            "partitionColumn",
            "lowerBound",
            "upperBound",
            "numPartitions",
        )
    }
    last_exc: Exception | None = None
    for quoted in (True, False):
        ident = f'"{column}"' if quoted else column
        probe = dict(base)
        probe["query"] = f"SELECT MIN({ident}) AS lo, MAX({ident}) AS hi FROM {table}"
        try:
            row = spark.read.format("jdbc").options(**probe).load().collect()[0]
            return row[0], row[1]
        except Exception as exc:  # noqa: BLE001 — classified below
            last_exc = exc
            if quoted and not is_identifier_resolution_error(exc):
                # transient failure (lock timeout, connection blip): the
                # unquoted retry could case-normalize onto a DIFFERENT
                # same-named column — surface the real error instead
                raise
            if quoted:
                log.warning(
                    "quoted bounds probe failed for %s.%s (identifier "
                    "resolution) — retrying with the store-cased unquoted "
                    "identifier",
                    table,
                    column,
                )
    raise last_exc


def jdbc_reader(spark: SparkSession, source: SourceSpec, job: CopyJob) -> DataFrame:
    opts = jdbc_read_options(source, job)
    if "partitionColumn" in opts and not (
        "lowerBound" in opts and "upperBound" in opts
    ):
        lo, hi = probe_partition_bounds(
            spark, source.options, opts["dbtable"], opts["partitionColumn"]
        )
        if lo is None:
            # empty table: nothing to range-split — single (empty) scan
            for k in ("partitionColumn", "lowerBound", "upperBound", "numPartitions"):
                opts.pop(k, None)
        else:
            opts["lowerBound"], opts["upperBound"] = str(lo), str(hi)
    df = spark.read.format("jdbc").options(**opts).load()
    mode, payload = job.select_source()
    if mode == "table" and payload[1]:
        # column pruning: compiled into the source-side SELECT by the JDBC
        # relation (visible as a narrowed ReadSchema), dialect-quoted
        df = df.select(*payload[1])
    return df


def jdbc_write_options(source: SourceSpec, table: str, *, locked_mode: bool = True) -> dict[str, str]:
    """Writer options: batchsize + isolation analog of LOCKED loads."""
    opts = dict(source.options)
    opts["dbtable"] = table
    opts.setdefault("batchsize", str(DEFAULT_BATCH_SIZE))
    if locked_mode:
        opts.setdefault("isolationLevel", "NONE")
    return opts


def jdbc_writer(df: DataFrame, source: SourceSpec, table: str, *, mode: str = "append", locked_mode: bool = True) -> None:
    (
        df.write.format("jdbc")
        .options(**jdbc_write_options(source, table, locked_mode=locked_mode))
        .mode(mode)
        .save()
    )


#: CSV staging conventions for the bulk-load path — Derby's import proc
#: reads comma-separated, double-quote-delimited fields with doubled
#: embedded quotes; empty-UNQUOTED means NULL, quoted "" means empty string
#: (Spark's write defaults emit exactly that split). Timestamp/date render
#: in Derby's JDBC-escape shapes; the 6-digit fraction carries Spark's full
#: microsecond timestamp precision (Derby's import parses fractions up to
#: nanoseconds — the reference's Timestamp.toString() staging likewise
#: keeps the full fraction, CopyTool.java:695-721).
BULK_CSV_OPTIONS = {
    "header": "false",
    "quote": '"',
    "escape": '"',
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "dateFormat": "yyyy-MM-dd",
}


class BulkLoadError(RuntimeError):
    """The staged-CSV bulk load could not be completed (staging invisible to
    the server, partial part-file set, import failure, or a post-import
    row-count mismatch) and fallback was disabled."""


def bulk_dialect(url: str) -> str:
    """Dialect key for a JDBC url's server-side bulk-import support.

    Raises ``ValueError`` for dialects without a known server-side COPY —
    the loader then degrades to the distributed INSERT path up front
    (before any staging I/O)."""
    for prefix, name in (
        ("jdbc:derby:", "derby"),
        ("jdbc:monetdb:", "monetdb"),
        ("jdbc:postgresql:", "postgresql"),
    ):
        if url.startswith(prefix):
            return name
    raise ValueError(f"no server-side bulk import for JDBC url {url.split(':', 2)[:2]}")


def monetdb_staged_frame(df: DataFrame) -> DataFrame:
    """Render a frame into MonetDB staging lines — ONE string column
    ``value`` per record, serialized exactly like the reference's writer
    (``CopyTool.java:691-733``):

    - NULL is the bare, UNQUOTED two-character token ``\\N``;
    - every non-null value is double-quoted, with backslash escaping
      inside the quotes (``\\`` -> ``\\\\`` then ``"`` -> ``\\"``,
      the reference's replace order);
    - fields joined by ``,``, records by ``\\n`` — the exact dialect the
      COPY statement declares (``USING DELIMITERS ',','\\n','\"' NULL AS
      '\\\\N'``, ``CopyTool.java:1058``).

    Spark's csv writer cannot express this split: with ``quoteAll`` it
    quotes the nullValue token too, so a staged NULL becomes ``"\\N"`` —
    byte-identical to a quoted literal-``\\N`` data value, and string
    NULLs would round-trip as the 2-char literal with no row-count
    shortfall to trip the loader's verification. Rendering the line
    JVM-side (when/concat/replace — whole-stage codegen, no Python) is
    the only serializer that keeps the null token unquoted while quoting
    all data.

    Timestamps render at full microsecond precision, dates ISO, binary
    hex — the same conventions as the csv staging path.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    fields = []
    for f in df.schema.fields:
        col = F.col(f.name)
        if isinstance(f.dataType, T.BinaryType):
            rendered = F.hex(col)
        elif isinstance(f.dataType, T.TimestampType):
            rendered = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif isinstance(f.dataType, T.DateType):
            rendered = F.date_format(col, "yyyy-MM-dd")
        else:
            rendered = col.cast("string")
        escaped = F.replace(
            F.replace(rendered, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        )
        fields.append(
            F.when(col.isNull(), F.lit("\\N")).otherwise(
                F.concat(F.lit('"'), escaped, F.lit('"'))
            )
        )
    return df.select(F.concat_ws(",", *fields).alias("value"))


def stage_bulk_frame(df: DataFrame, url: str, stage_dir: str) -> None:
    """Distributed staging write, dialect-dispatched serializer.

    Derby/PostgreSQL: Spark's csv writer with :data:`BULK_CSV_OPTIONS`
    (RFC4180 doubled quotes; unquoted-empty = NULL — both stores' native
    csv import dialect). MonetDB: the reference's serializer re-expressed
    as :func:`monetdb_staged_frame` written through the text source —
    backslash-escaped quoting with a bare unquoted ``\\N`` null token,
    which the csv writer cannot produce."""
    if bulk_dialect(url) == "monetdb":
        monetdb_staged_frame(df).write.mode("overwrite").text(stage_dir)
        return
    writer = df.write.mode("overwrite")
    for k, v in BULK_CSV_OPTIONS.items():
        writer = writer.option(k, v)
    writer.csv(stage_dir)


def server_bulk_import_sql(
    url: str, table: str, path: str, *, locked: bool = False
) -> tuple[str, list[str]]:
    """One staged part file's server-side bulk-import statement —
    the reference's COPY INTO builder re-expressed per dialect
    (``CopyTool.java:1042-1071``). Returns ``(sql, params)``; empty
    params means plain ``execute``.

    - Derby: ``SYSCS_UTIL.SYSCS_IMPORT_TABLE`` (parameterized call; the
      integration-tested path — embedded Derby ships with Spark).
    - MonetDB: the reference's statement verbatim —
      ``COPY INTO t FROM 'file' USING DELIMITERS ',','\\n','\"'
      NULL AS '\\\\N' [LOCKED]`` (``locked`` = the reference's
      use-locked-mode flag, ``CopyTable.java:65``). Statement-shape
      parity is unit-pinned; no MonetDB server exists in this sandbox,
      so the path is integration-ready rather than integration-proven.
    - PostgreSQL: server-side ``COPY ... FROM ... (FORMAT csv)`` —
      requires the file be readable by the SERVER process, the same
      visibility contract as the other two.
    """
    dialect = bulk_dialect(url)
    esc = path.replace("'", "''")
    if dialect == "derby":
        # the import proc takes schema and table as SEPARATE case-sensitive
        # arguments (NULL schema = the connection's default); a qualified
        # name is split here while MonetDB/PG COPY take it verbatim
        schema, _, bare = table.rpartition(".")
        call = "CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(?, ?, ?, NULL, NULL, 'UTF-8', 0)"
        if schema:
            return (call, [schema.upper(), bare.upper(), path])
        return (
            "CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(NULL, ?, ?, NULL, NULL, 'UTF-8', 0)",
            [bare.upper(), path],
        )
    if dialect == "monetdb":
        sql = (
            f"COPY INTO {table} FROM '{esc}'"
            " USING DELIMITERS ',','\\n','\"' NULL AS '\\\\N'"
        )
        if locked:
            sql += " LOCKED"
        return (sql, [])
    return (
        f"COPY {table} FROM '{esc}' WITH (FORMAT csv, QUOTE '\"', ESCAPE '\"')",
        [],
    )


def effective_import_concurrency(url: str, requested: int) -> int:
    """Clamp the bulk loader's per-part import fan-out to what the target
    server actually supports. PostgreSQL accepts concurrent COPYs into one
    table (MVCC appends); Derby's SYSCS_IMPORT_TABLE takes a table lock and
    MonetDB serializes COPY INTO on the table (always under LOCKED mode),
    so both clamp to 1 — the reference's single connection. The default of
    1 everywhere keeps the conservative, reference-parity behavior; a user
    opts in per job."""
    if requested <= 1:
        return 1
    return requested if bulk_dialect(url) == "postgresql" else 1


def driver_connection(spark: SparkSession, options: dict[str, str]):
    """Driver-side java.sql.Connection honoring the FULL option map — the
    ``driver`` class is loaded explicitly and ``user``/``password`` travel
    as connection properties (DriverManager.getConnection(url) alone
    silently drops credentials, which no embedded-Derby test ever catches
    because Derby needs none)."""
    jvm = spark._jvm  # noqa: SLF001
    if options.get("driver"):
        jvm.java.lang.Class.forName(options["driver"])
    props = jvm.java.util.Properties()
    for key in ("user", "password"):
        if options.get(key):
            props.setProperty(key, options[key])
    return jvm.java.sql.DriverManager.getConnection(options["url"], props)


def _execute_update(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _drop_table_if_exists(conn, table: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(f"DROP TABLE {table}")
    except Exception:  # noqa: BLE001 — table absent: nothing to drop
        pass
    finally:
        st.close()


def _import_one_part(conn, url: str, table: str, part: str, locked: bool) -> None:
    sql, params = server_bulk_import_sql(url, table, part, locked=locked)
    if params:
        cs = conn.prepareCall(sql)
        try:
            for i, p in enumerate(params, start=1):
                cs.setString(i, p)
            cs.execute()
        finally:
            cs.close()
    else:
        _execute_update(conn, sql)


def _server_count(conn, table: str) -> int:
    st = conn.createStatement()
    try:
        rs = st.executeQuery(f"SELECT COUNT(*) FROM {table}")
        rs.next()
        return int(rs.getLong(1))
    finally:
        st.close()


def jdbc_bulk_loader(
    spark: SparkSession,
    df: DataFrame,
    source: SourceSpec,
    table: str,
    *,
    table_ddl: str | None = None,
    staging_dir: str | None = None,
    expected_count: int | None = None,
    fallback: bool = True,
    locked: bool = False,
    import_concurrency: int = 1,
) -> str:
    """Staged-CSV bulk load — the reference's COPY INTO path
    (``CopyTool.java:1042-1071``), with the reference's own degradation
    chain (COPY-from-file -> batched INSERT, ``CopyTool.java:829-866``)
    re-expressed for Spark. Returns the path that loaded the table:
    ``"copy"`` (server-side bulk import) or ``"insert"`` (the distributed
    :func:`jdbc_writer` fallback).

    1. executors stage the frame as part files (distributed write, no
       database connection on any executor) — serializer dispatched by
       dialect (:func:`stage_bulk_frame`: RFC4180 csv for Derby/PG, the
       reference's backslash-escaped lines with bare ``\\N`` nulls for
       MonetDB);
    2. the driver creates the table (DDL from the engine's schema mapper
       unless ``table_ddl`` pins explicit types) and issues ONE server-side
       bulk-import call per part file, dialect-dispatched by
       :func:`server_bulk_import_sql` (Derby:
       ``SYSCS_UTIL.SYSCS_IMPORT_TABLE``; MonetDB: the reference's
       ``COPY INTO ... USING DELIMITERS ... NULL AS '\\N' [LOCKED]``
       statement verbatim, with ``\\N``-staged nulls; PostgreSQL:
       ``COPY ... (FORMAT csv)``). A dialect with no known server-side
       COPY degrades to the INSERT path BEFORE staging;
    3. the loaded row count is verified against the frame's count (the
       reference's pre-load count file, ``CopyTool.java:643-649``). Any
       shortfall — zero staged part files, an import error, or a count
       mismatch — means the staging path was not fully server-visible;
       with ``fallback=True`` (default) the half-load is dropped and the
       table is reloaded through the distributed batched-INSERT
       :func:`jdbc_writer`, exactly the reference's fallback order; with
       ``fallback=False`` a :class:`BulkLoadError` is raised.

    **Cluster contract**: ``staging_dir`` (default: a driver-local tmpdir)
    must be a filesystem BOTH the executors and the database server can
    see — on a multi-node cluster that means shared storage (NFS/HDFS
    fuse), the same constraint the reference documents for COPY INTO FROM
    file (``CopyTool.java:756-870``). When it is not (executors committed
    part files to their own local disks, so the driver-side glob sees a
    partial set), the count verification catches the shortfall and the
    loader degrades to the INSERT path instead of silently importing a
    partial table.

    ``expected_count`` lets callers that already counted the extract (the
    engine's pre-scan count, op #4) skip the extra count job here.

    ``import_concurrency`` opts into issuing the per-part server imports
    from multiple driver threads (own connection each) — honored only for
    dialects whose server accepts concurrent COPYs into one table
    (:func:`effective_import_concurrency`; PostgreSQL yes, Derby/MonetDB
    clamp to 1). Default 1 = the reference's single-connection behavior.

    BinaryType columns are hex-encoded at staging (Derby's documented
    import representation for BLOB data without LOB side-files).
    """
    import glob
    import logging
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..schema.mapper import spark_schema_to_derby_ddl

    log = logging.getLogger(__name__)
    url = source.options["url"]
    # derive DDL before staging: an unmappable column fails loudly here
    # (UnknownSqlTypeError) instead of after a useless distributed write
    ddl = table_ddl if table_ddl is not None else spark_schema_to_derby_ddl(df.schema)
    # dialect gate, also before staging: a target with no server-side COPY
    # degrades straight to the INSERT path (no useless distributed write)
    try:
        bulk_dialect(url)
    except ValueError as exc:
        if not fallback:
            raise BulkLoadError(f"{table}: {exc}") from exc
        log.warning("bulk load of %s degraded to INSERT path: %s", table, exc)
        conn = driver_connection(spark, source.options)
        try:
            _execute_update(conn, f"CREATE TABLE {table} ({ddl})")
        finally:
            conn.close()
        jdbc_writer(df, source, table, mode="append")
        return "insert"
    if expected_count is None:
        expected_count = df.count()
    staged = df.select(
        *[
            F.hex(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.BinaryType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
    base_dir = staging_dir or tempfile.mkdtemp(prefix="jdbc_bulk_")
    csv_dir = os.path.join(base_dir, f"stage_{table}")
    stage_bulk_frame(staged, url, csv_dir)

    conn = driver_connection(spark, source.options)
    try:
        _execute_update(conn, f"CREATE TABLE {table} ({ddl})")
        failure: str | None = None
        parts = sorted(glob.glob(os.path.join(csv_dir, "part-*")))
        if not parts and expected_count > 0:
            failure = f"no staged part files visible at {csv_dir}"
        else:
            # dialect-dispatched server-side import, one call per part file
            # (Derby: parameterized SYSCS_IMPORT_TABLE — unquoted CREATE
            # stores the name uppercase and the proc matches its tablename
            # argument case-SENSITIVELY; MonetDB/PostgreSQL: plain COPY).
            # The loop is deliberately driver-sequential at concurrency=1:
            # server-side COPY serializes on the table lock in every
            # supported store anyway (and matches the reference's single
            # connection); `import_concurrency` opts into parallel COPYs
            # where the server allows them (PostgreSQL).
            try:
                workers = effective_import_concurrency(url, import_concurrency)
                if workers > 1 and len(parts) > 1:
                    # one driver-side connection per worker thread; a
                    # mid-flight failure leaves a partial import that the
                    # count verification below catches (same degradation
                    # chain as the serial path)
                    from concurrent.futures import ThreadPoolExecutor

                    def _import_on_own_conn(part: str) -> None:
                        c = driver_connection(spark, source.options)
                        try:
                            _import_one_part(c, url, table, part, locked)
                        finally:
                            c.close()

                    with ThreadPoolExecutor(max_workers=workers) as pool:
                        for fut in [
                            pool.submit(_import_on_own_conn, p) for p in parts
                        ]:
                            fut.result()
                else:
                    for part in parts:
                        _import_one_part(conn, url, table, part, locked)
            except Exception as exc:  # noqa: BLE001 — degrade per reference chain
                failure = f"server-side import failed: {exc}"
        if failure is None:
            loaded = _server_count(conn, table)
            if loaded != expected_count:
                failure = (
                    f"bulk load row-count mismatch: imported {loaded}, "
                    f"expected {expected_count} (staging dir {csv_dir} "
                    f"not fully server-visible?)"
                )
        if failure is None:
            return "copy"
        if not fallback:
            raise BulkLoadError(f"{table}: {failure}")
        # The reference's COPY-file -> INSERT degradation
        # (CopyTool.java:829-866): drop the half-load, recreate with the
        # same DDL, reload through the distributed batched writer.
        log.warning("bulk load of %s degraded to INSERT path: %s", table, failure)
        _drop_table_if_exists(conn, table)
        _execute_update(conn, f"CREATE TABLE {table} ({ddl})")
    finally:
        conn.close()
    jdbc_writer(df, source, table, mode="append")
    return "insert"


def derby_shutdown(spark: SparkSession, db_path: str) -> None:
    """Cleanly shut down ONE embedded-Derby database (flushes the log so a
    filesystem snapshot of the directory is consistent). Derby signals a
    successful single-db shutdown by RAISING SQLState 08006 — so that state
    is swallowed, and anything else (database not found, boot failure — the
    cases where a subsequent snapshot would zip an unflushed store) is
    re-raised loudly."""
    try:
        spark._jvm.java.sql.DriverManager.getConnection(  # noqa: SLF001
            f"jdbc:derby:{db_path};shutdown=true"
        )
    except Exception as exc:
        jexc = getattr(exc, "java_exception", None)
        state = None
        if jexc is not None:
            try:
                state = jexc.getSQLState()
            except Exception:  # noqa: BLE001 — not an SQLException
                state = None
        if state == "08006":
            return  # Derby's documented success signal
        raise
    raise RuntimeError(
        f"derby shutdown of {db_path!r} returned a connection instead of "
        "raising SQLState 08006 — the database was not shut down"
    )


def derby_snapshot_jar(spark: SparkSession, db_path: str, *, tag: str | None = None) -> str:
    """Freeze an embedded-Derby database into a read-only ``jar:`` snapshot
    every JVM can open concurrently.

    Embedded Derby allows exactly ONE booting JVM per database directory
    (db.lck), so a ``local-cluster`` / real-cluster partitioned read of a
    driver-written fixture db would crash in executor boots. Derby's
    documented escape is the read-only jar subprotocol
    (``jdbc:derby:jar:(file.jar)dbname``): each JVM boots its own
    lock-free read-only instance. This turns the sandbox's embedded
    fixture into a URL reachable from every executor — the same shape as
    a real deployment's server URL (multi-executor probe: SCALE.md r8).

    Returns the jar-subprotocol JDBC url for the snapshot.

    ``tag`` makes the jar FILENAME unique: Derby identifies a jar database
    by its full subprotocol URL and keeps it BOOTED for the JVM's
    lifetime, so re-snapshotting to the same path silently serves the
    FIRST snapshot's content forever (callers re-snapshotting an evolving
    db — e.g. per micro-batch — must tag each snapshot).
    """
    derby_shutdown(spark, db_path)
    parent = os.path.dirname(db_path)
    name = os.path.basename(db_path)
    fname = f"{name}-{tag}.jar" if tag else f"{name}.jar"
    jar_path = os.path.join(parent, fname)
    with zipfile.ZipFile(jar_path, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(db_path):
            for fname in files:
                full = os.path.join(root, fname)
                zf.write(full, os.path.relpath(full, parent))
    return f"jdbc:derby:jar:({jar_path}){name}"


def partition_bounds_options(
    partition_column: str, lower: int, upper: int, *, num_partitions: int = DEFAULT_NUM_PARTITIONS
) -> dict[str, str]:
    """Options enabling Spark's range-partitioned JDBC scan.

    At cluster scale this is what turns the reference's single forward
    cursor into N concurrent range queries; bounds come from a cheap
    ``SELECT MIN(c), MAX(c)`` probe on the source (the same probe shape as
    the watermark trigger)."""
    if lower > upper:
        raise ValueError(f"lower bound {lower} > upper bound {upper}")
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(max(1, num_partitions)),
    }
