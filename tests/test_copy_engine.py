"""End-to-end copy pipeline: extract -> versioned load -> publish -> retention
(SURVEY §3.1), including empty guard, no-switch/switch-only modes, temp-table
promotion and queryability of published views."""

from __future__ import annotations

from datetime import datetime

import pytest

from mssql2monetdb_spark.config.spec import load_spec
from mssql2monetdb_spark.engine.copy import (
    EXIT_ERROR,
    EXIT_NO_NEW_DATA,
    EXIT_OK,
    CopyEngine,
    EmptyTablesError,
)
from mssql2monetdb_spark.engine.publish import VersionedCatalog, physical_name, version_of

SF = "/root/testdata/sf0.001"


def make_spec(tmp_path, tables=None, **extra):
    return load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {"_default": {"format": "parquet", "path": SF}},
            "tables": tables or {"nation_job": {"from_table": "nation"}},
            **extra,
        }
    )


def test_copy_end_to_end(spark, tmp_path):
    engine = CopyEngine(spark, make_spec(tmp_path))
    published = engine.do_copy(load_date=datetime(2024, 1, 1, 0, 0, 0))
    assert published == {"nation_job": "nation_2024_01_01_00_00_00"}
    # published view answers queries
    n = engine.sql("SELECT COUNT(*) AS n FROM nation").collect()[0]["n"]
    assert n == 25
    # physical naming parity (MonetDBTable.java:31-43)
    assert version_of(published["nation_job"]) == "2024_01_01_00_00_00"


def test_versioning_and_retention(spark, tmp_path):
    engine = CopyEngine(spark, make_spec(tmp_path))
    cat = engine.catalog
    for day in (1, 2, 3):
        engine.do_copy(load_date=datetime(2024, 1, day))
    versions = cat.table_versions("default", "nation")
    # keep 2: current + one backup (CopyTool.java:575-580)
    assert versions == ["nation_2024_01_03_00_00_00", "nation_2024_01_02_00_00_00"]
    assert cat.current_version("default", "nation") == "nation_2024_01_03_00_00_00"


def test_empty_guard(spark, tmp_path):
    # empty source aborts the whole run (SourceDatabaseUtil.java:22-52)
    spec = make_spec(
        tmp_path,
        tables={
            "empty_job": {
                "from_table": None,
                "from_query": "SELECT * FROM nation WHERE n_nationkey < 0",
                "count_query": "SELECT COUNT(*) FROM nation WHERE n_nationkey < 0",
                "to_table": "empty_t",
            }
        },
    )
    engine = CopyEngine(spark, spec)
    with pytest.raises(EmptyTablesError):
        engine.do_copy()

    # allowEmpty loads schema + zero rows (CopyTool.java:673-678,816-820)
    spec2 = make_spec(
        tmp_path,
        tables={
            "empty_job": {
                "from_table": None,
                "from_query": "SELECT * FROM nation WHERE n_nationkey < 0",
                "count_query": "SELECT COUNT(*) FROM nation WHERE n_nationkey < 0",
                "to_table": "empty_t",
                "allow_empty": True,
            }
        },
    )
    engine2 = CopyEngine(spark, spec2)
    engine2.do_copy(load_date=datetime(2024, 1, 1))
    out = engine2.sql("SELECT * FROM empty_t")
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["n_nationkey", "n_name", "n_regionkey"]


def test_query_mode_evaluates_natively(spark, tmp_path):
    # arbitrary SQL evaluated by Spark, not shipped anywhere
    spec = make_spec(
        tmp_path,
        tables={
            "top_cust": {
                "from_table": None,
                "from_query": """
                    SELECT c_nationkey, COUNT(*) AS n_customers
                    FROM customer GROUP BY c_nationkey
                """,
                "count_query": "SELECT COUNT(DISTINCT c_nationkey) FROM customer",
                "to_table": "cust_by_nation",
            }
        },
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    total = engine.sql("SELECT SUM(n_customers) AS s FROM cust_by_nation").collect()[0]["s"]
    assert total == 150  # sf0.001 customer count


def test_count_query_not_shadowed_across_sources(spark, tmp_path):
    """Two query-mode sources exposing the same bare table name: each job's
    count_query must target its OWN source's relation, not whichever source
    registered its temp views last (regression for view shadowing)."""
    for name, n_rows in (("src_a", 3), ("src_b", 7)):
        d = tmp_path / name
        d.mkdir()
        spark.range(n_rows).selectExpr("id AS k").write.parquet(str(d / "t.parquet"))
    spec = load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {
                "a": {"format": "parquet", "path": str(tmp_path / "src_a")},
                "b": {"format": "parquet", "path": str(tmp_path / "src_b")},
            },
            "tables": {
                "job_a": {
                    "source": "a",
                    "from_table": None,
                    "from_query": "SELECT * FROM t",
                    "count_query": "SELECT COUNT(*) FROM t",
                    "to_table": "t_a",
                },
                "job_b": {
                    "source": "b",
                    "from_table": None,
                    "from_query": "SELECT * FROM t",
                    "count_query": "SELECT COUNT(*) FROM t",
                    "to_table": "t_b",
                },
            },
        }
    )
    engine = CopyEngine(spark, spec)
    # extract both first so the LAST registration of view `t` (source b)
    # would shadow source a's if counts resolved against stale views
    frames = {job_id: engine._extract(job) for job_id, job in spec.jobs.items()}
    counts = engine.assert_non_empty(frames)
    assert counts == {"job_a": 3, "job_b": 7}


def test_projection_mode(spark, tmp_path):
    spec = make_spec(
        tmp_path,
        tables={"t": {"from_table": "customer", "from_columns": ["c_custkey", "c_name"]}},
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    df = engine.sql("SELECT * FROM customer")
    assert df.columns == ["c_custkey", "c_name"]  # CopyTable.java:314-322


def test_no_switch_then_switch_only(spark, tmp_path):
    # --no-switch loads but doesn't publish; --switch-only publishes later
    # (CopyToolConfig.java:116-279 CLI modes)
    engine = CopyEngine(spark, make_spec(tmp_path))
    loaded = engine.do_copy(no_switch=True, load_date=datetime(2024, 1, 1))
    assert engine.catalog.current_version("default", "nation") is None
    assert engine.catalog.newest_version("default", "nation") == loaded["nation_job"]

    published = engine.do_copy(switch_only=True)
    assert published["nation_job"] == loaded["nation_job"]
    assert engine.sql("SELECT COUNT(*) AS n FROM nation").collect()[0]["n"] == 25


def test_switch_table_cli_configless(spark, tmp_path, capsys):
    """The reference's config-less single-table switch synthesis
    (CopyToolConfig.java:219-249: --switch-only + connection/table params
    and NO config file builds a drop+fast-view-switch job on the fly).
    Spark-side: `--switch-table schema.table --warehouse dir` publishes
    the newest loaded-but-unpublished version, phases 3-4 only."""
    from mssql2monetdb_spark.cli import main

    engine = CopyEngine(spark, make_spec(tmp_path))
    loaded = engine.do_copy(no_switch=True, load_date=datetime(2024, 1, 1))
    assert engine.catalog.current_version("default", "nation") is None

    rc = main(["--switch-table", "nation", "--warehouse", str(tmp_path / "wh")])
    assert rc == 0
    assert "published default.nation" in capsys.readouterr().out
    cat = VersionedCatalog(str(tmp_path / "wh"))
    assert cat.current_version("default", "nation") == loaded["nation_job"]

    # missing prerequisites fail with the reference's error exit, not a crash
    assert main(["--switch-table", "nation"]) == EXIT_ERROR
    assert (
        main(["--switch-table", "missing", "--warehouse", str(tmp_path / "wh")])
        == EXIT_ERROR
    )


def test_temp_table_promotion(spark, tmp_path):
    # copy-via-temp-table: load under tmp_, CTAS-promote at publish
    # (CopyTool.java:1107-1124)
    spec = make_spec(
        tmp_path,
        tables={"j": {"from_table": "region", "use_fast_view_switching": False}},
    )
    engine = CopyEngine(spark, spec)
    published = engine.do_copy(load_date=datetime(2024, 1, 1))
    assert published["j"] == "region_2024_01_01_00_00_00"
    assert engine.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"] == 5
    # no tmp_ leftovers
    assert engine.catalog.table_versions("default", "tmp_region") == []

    # same-load_date retry keeps the overwrite/idempotent contract in temp
    # mode too: os.replace cannot rename onto a non-empty directory, so
    # the promotion overwrites the existing same-name version explicitly
    published2 = engine.do_copy(load_date=datetime(2024, 1, 1))
    assert published2 == published
    assert engine.catalog.table_versions("default", "region") == [
        "region_2024_01_01_00_00_00"
    ]
    assert engine.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"] == 5


def test_exit_codes(spark, tmp_path):
    engine = CopyEngine(spark, make_spec(tmp_path))
    assert engine.run(load_date=datetime(2024, 1, 1)) == EXIT_OK


def test_trigger_skip_exit_code(spark, tmp_path):
    spec = make_spec(
        tmp_path,
        tables={
            "ev": {
                "from_table": "events",
                "trigger": {"column": "ts"},
            }
        },
    )
    engine = CopyEngine(spark, spec)
    # first run: no state -> runs, persists watermark
    assert engine.run(load_date=datetime(2024, 1, 1)) == EXIT_OK
    # second run: unchanged max(ts) -> exit 2 (CopyTool.java:95-98)
    assert engine.run(load_date=datetime(2024, 1, 2)) == EXIT_NO_NEW_DATA


def test_register_all_fresh_session(spark, tmp_path):
    # republish views from manifests alone (switch-only across sessions)
    engine = CopyEngine(spark, make_spec(tmp_path))
    engine.do_copy(load_date=datetime(2024, 1, 1))
    spark.catalog.dropTempView("nation")
    cat = VersionedCatalog(str(tmp_path / "wh"))
    assert cat.register_all(spark) == ["default.nation"]
    assert spark.sql("SELECT COUNT(*) AS n FROM nation").collect()[0]["n"] == 25


def test_physical_name_format():
    assert (
        physical_name("orders", datetime(2024, 12, 31, 23, 59, 58))
        == "orders_2024_12_31_23_59_58"
    )


def test_csv_source_end_to_end(spark, tmp_path):
    """CSV source with the reference's conventions (\\N nulls, quoting)."""
    from mssql2monetdb_spark.sources.readers import write_csv_compat

    src_dir = tmp_path / "csv_src"
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, 'qu"ote', 3.5)], "id long, s string, v double"
    )
    write_csv_compat(df, str(src_dir / "t.csv"))
    spec = load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {"_default": {"format": "csv", "path": str(src_dir)}},
            "tables": {"j": {"from_table": "t"}},
        }
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    rows = {r["id"]: r for r in engine.sql("SELECT * FROM t").collect()}
    assert rows[1]["v"] is None  # \N round-trips to NULL
    assert rows[2]["s"] == 'qu"ote'


def test_incremental_append_mode(spark, tmp_path):
    """incremental: delta-only extraction appended to the published snapshot."""
    import pyspark.sql.functions as F

    src_dir = tmp_path / "inc_src"
    spec_dict = {
        "warehouse_dir": str(tmp_path / "wh"),
        "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
        "tables": {
            "ev": {"from_table": "ev", "trigger": {"column": "seq"}, "incremental": True}
        },
    }
    v1 = spark.range(0, 100).select(F.col("id").alias("seq"), (F.col("id") * 2).alias("v"))
    v1.write.mode("overwrite").parquet(str(src_dir / "ev.parquet"))
    engine = CopyEngine(spark, load_spec(spec_dict))
    assert engine.run(load_date=datetime(2024, 1, 1)) == EXIT_OK
    assert engine.sql("SELECT COUNT(*) AS n FROM ev").collect()[0]["n"] == 100

    # unchanged source -> exit 2, nothing recopied
    assert engine.run(load_date=datetime(2024, 1, 2)) == EXIT_NO_NEW_DATA

    # source gains rows 100..119 (and REWRITES old rows with garbage values —
    # incremental mode must NOT pick those up: only seq > watermark)
    v2 = spark.range(0, 120).select(
        F.col("id").alias("seq"),
        (F.when(F.col("id") < 100, -999).otherwise(F.col("id") * 2)).alias("v"),
    )
    v2.write.mode("overwrite").parquet(str(src_dir / "ev.parquet"))
    assert engine.run(load_date=datetime(2024, 1, 3)) == EXIT_OK
    out = engine.sql("SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s FROM ev").collect()[0]
    assert out["n"] == 120
    # old rows kept from the snapshot (sum of 2*i for i<100), new rows appended
    assert out["s"] == sum(2 * i for i in range(120))


def test_cli_schema_evolution_incremental_flow(spark, tmp_path, capsys):
    """The reference's real operating mode, end-to-end through the CLI:
    repeated runs of ``python -m mssql2monetdb_spark -c spec.json`` over a
    changing source — exit 0 (first load), exit 2 (trigger unchanged),
    then a source schema evolution + delta append picked up in one run,
    with the published view widened to the evolved schema."""
    import json

    import pyspark.sql.functions as F

    from mssql2monetdb_spark.cli import main

    src_dir = tmp_path / "src"
    cfg_path = tmp_path / "spec.json"
    cfg_path.write_text(
        json.dumps(
            {
                "warehouse_dir": str(tmp_path / "wh"),
                "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
                "tables": {
                    "ev": {
                        "from_table": "ev",
                        "trigger": {"column": "seq"},
                        "incremental": True,
                    }
                },
            }
        )
    )

    v1 = spark.range(0, 100).select(F.col("id").alias("seq"), (F.col("id") * 2).alias("v"))
    v1.write.mode("overwrite").parquet(str(src_dir / "ev.parquet"))
    assert main(["-c", str(cfg_path)]) == EXIT_OK
    # unchanged max(seq) -> exit 2, the scheduled-run skip path
    assert main(["-c", str(cfg_path)]) == EXIT_NO_NEW_DATA

    # the source evolves: new column w, plus 20 rows past the watermark
    v2 = spark.range(0, 120).select(
        F.col("id").alias("seq"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") + 1000).alias("w"),
    )
    v2.write.mode("overwrite").parquet(str(src_dir / "ev.parquet"))
    assert main(["-c", str(cfg_path)]) == EXIT_OK

    # --query reads the published view; exit 2 because nothing new remains
    capsys.readouterr()
    code = main(
        [
            "-c",
            str(cfg_path),
            "--query",
            "SELECT COUNT(*) AS n, COUNT(w) AS n_w, CAST(SUM(w) AS BIGINT) AS s_w FROM ev",
        ]
    )
    assert code == EXIT_NO_NEW_DATA
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # snapshot rows carried over, delta appended, schema evolved: the 100
    # pre-evolution rows hold NULL w, the 20 delta rows carry real values
    assert row == {"n": 120, "n_w": 20, "s_w": sum(i + 1000 for i in range(100, 120))}


def test_per_job_watermark_state_isolated(spark, tmp_path):
    """two triggered jobs must keep independent watermark state."""
    spec = make_spec(
        tmp_path,
        tables={
            "a": {"from_table": "events", "to_table": "ev_a", "trigger": {"column": "event_id"}},
            "b": {"from_table": "orders", "to_table": "ord_b", "trigger": {"column": "o_orderkey"}},
        },
    )
    engine = CopyEngine(spark, spec)
    assert engine.run(load_date=datetime(2024, 1, 1)) == EXIT_OK
    sa = engine.store.load(engine.checksum, "a")
    sb = engine.store.load(engine.checksum, "b")
    assert sa is not None and sb is not None and sa.value != sb.value


def test_time_travel_table_at(spark, tmp_path):
    engine = CopyEngine(spark, make_spec(tmp_path))
    engine.do_copy(load_date=datetime(2024, 1, 1))
    engine.do_copy(load_date=datetime(2024, 1, 2))
    cat = engine.catalog
    cur = cat.table_at(spark, "default", "nation")
    old = cat.table_at(spark, "default", "nation", version="2024_01_01_00_00_00")
    assert cur.count() == old.count() == 25
    with pytest.raises(FileNotFoundError, match="not retained"):
        cat.table_at(spark, "default", "nation", version="1999_01_01_00_00_00")


def test_sort_by_clusters_files(spark, tmp_path):
    """sort_by clusters rows within files -> parquet row-group stats enable
    data skipping on that column."""
    spec = make_spec(
        tmp_path, tables={"j": {"from_table": "orders", "sort_by": ["o_totalprice"]}}
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    version_dir = engine.catalog.version_dir(
        "default", engine.catalog.current_version("default", "orders")
    )
    import glob as _glob

    import pyarrow.parquet as pq

    for f in _glob.glob(version_dir + "/part-*.parquet"):
        vals = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"].to_pylist()
        assert vals == sorted(vals)


def test_partition_by_enables_pruning(spark, tmp_path):
    """partition_by writes hive-style dirs; a filter on the partition column
    shows up as partition pruning (not a data filter) in the plan."""
    import contextlib
    import io
    import os

    import pyspark.sql.functions as F

    src_dir = tmp_path / "p_src"
    ev = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("day_bucket"),
        (F.col("id") * 1.5).alias("value"),
    )
    ev.write.parquet(str(src_dir / "ev.parquet"))
    spec = load_spec(
        {
            "warehouse_dir": str(tmp_path / "wh"),
            "sources": {"_default": {"format": "parquet", "path": str(src_dir)}},
            "tables": {"j": {"from_table": "ev", "partition_by": ["day_bucket"]}},
        }
    )
    engine = CopyEngine(spark, spec)
    engine.do_copy(load_date=datetime(2024, 1, 1))
    vdir = engine.catalog.version_dir(
        "default", engine.catalog.current_version("default", "ev")
    )
    assert any(d.startswith("day_bucket=") for d in os.listdir(vdir))

    filtered = engine.sql("SELECT COUNT(*) AS n FROM ev WHERE day_bucket = 3")
    assert filtered.collect()[0]["n"] == len([i for i in range(1000) if i % 7 == 3])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        engine.sql("SELECT * FROM ev WHERE day_bucket = 3").explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "day_bucket" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_json_and_orc_sources(spark, tmp_path):
    for fmt in ("json", "orc"):
        src_dir = tmp_path / f"{fmt}_src"
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        getattr(df.write, fmt)(str(src_dir / f"t.{fmt}"))
        spec = load_spec(
            {
                "warehouse_dir": str(tmp_path / f"wh_{fmt}"),
                "sources": {"_default": {"format": fmt, "path": str(src_dir)}},
                "tables": {"j": {"from_table": "t", "to_table": f"t_{fmt}"}},
            }
        )
        engine = CopyEngine(spark, spec)
        engine.do_copy(load_date=datetime(2024, 1, 1))
        assert engine.sql(f"SELECT COUNT(*) AS n FROM t_{fmt}").collect()[0]["n"] == 2


def test_reader_survives_concurrent_publish(spark, tmp_path):
    """near-zero-downtime property: a reader holding the OLD version keeps
    working while a new version is published (files are immutable; retention
    keeps current+backup, so the old files still exist)."""
    engine = CopyEngine(spark, make_spec(tmp_path))
    engine.do_copy(load_date=datetime(2024, 1, 1))
    old_reader = engine.catalog.table_at(spark, "default", "nation")  # pin v1
    engine.do_copy(load_date=datetime(2024, 1, 2))  # publish v2
    # old plan still collectable after the switch
    assert old_reader.count() == 25
    # and the public view serves the new version
    assert (
        engine.catalog.current_version("default", "nation")
        == "nation_2024_01_02_00_00_00"
    )


def test_same_load_date_is_idempotent(spark, tmp_path):
    """re-running with the same load date overwrites the same version —
    crash-retry of a run cannot produce duplicate versions."""
    engine = CopyEngine(spark, make_spec(tmp_path))
    p1 = engine.do_copy(load_date=datetime(2024, 1, 1))
    p2 = engine.do_copy(load_date=datetime(2024, 1, 1))
    assert p1 == p2
    assert engine.catalog.table_versions("default", "nation") == [
        "nation_2024_01_01_00_00_00"
    ]
    assert engine.sql("SELECT COUNT(*) AS n FROM nation").collect()[0]["n"] == 25


def test_compact_shrinks_files_and_republishes(spark, tmp_path):
    """Compaction rewrites a fragmented published version into few files as
    a NEW version (atomic swap; the fragmented one stays until retention),
    preserving rows exactly."""
    import glob

    catalog = VersionedCatalog(str(tmp_path))
    df = spark.range(0, 10_000).withColumnRenamed("id", "k").repartition(32)
    v1 = catalog.write_version(df, "main", "t", datetime(2024, 1, 1, 0, 0, 0))
    catalog.publish(spark, "main", "t", v1)
    files_before = glob.glob(f"{catalog.version_dir('main', v1)}/part-*")
    assert len(files_before) > 4

    v2 = catalog.compact(
        spark, "main", "t", datetime(2024, 1, 1, 0, 0, 1), target_files=2, sort_by=["k"]
    )
    assert v2 != v1
    assert catalog.current_version("main", "t") == v2
    files_after = glob.glob(f"{catalog.version_dir('main', v2)}/part-*")
    assert len(files_after) == 2
    got = catalog.table_at(spark, "main", "t")
    assert got.count() == 10_000
    assert got.agg({"k": "sum"}).first()[0] == sum(range(10_000))
    # the fragmented version survives for time travel until cleanup
    assert v1 in catalog.table_versions("main", "t")


def test_incremental_same_second_tick_does_not_overwrite_snapshot(spark, tmp_path):
    """An INCREMENTAL tick whose load_date collides with the published
    version's name (1-second date granularity, rapid successive runs)
    must not overwrite the directory its own snapshot+delta plan is
    lazily reading — do_copy bumps the date past the name being read.
    Full-reload reruns keep the overwrite/idempotent contract
    (test_same_load_date_is_idempotent)."""
    from datetime import datetime

    from mssql2monetdb_spark.config.spec import CopyJob, JobSpec, SourceSpec
    from mssql2monetdb_spark.engine.copy import CopyEngine

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.parquet(
        str(src_dir / "t.parquet")
    )
    spec = JobSpec(
        sources={"s": SourceSpec(name="s", format="parquet", path=str(src_dir))},
        jobs={
            "j": CopyJob(
                job_id="j",
                source="s",
                from_table="t",
                to_table="t_sync",
                trigger_column="k",
                incremental=True,
            )
        },
        warehouse_dir=str(tmp_path / "wh"),
        state_dir=str(tmp_path / "state"),
    )
    engine = CopyEngine(spark, spec)
    d = datetime(2024, 6, 1)
    engine.do_copy(load_date=d)  # full load, watermark persisted

    spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir / "t.parquet"))
    engine.do_copy(load_date=d)  # same second: snapshot reads the published dir

    versions = engine.catalog.table_versions("default", "t_sync")
    assert len(versions) == 2, f"incremental tick reused the snapshot's name: {versions}"
    assert engine.catalog.table_at(spark, "default", "t_sync").count() == 15

    # third same-second tick: must bump past EVERY retained name (not
    # just the current one) — landing back on tick 1's name would
    # destroy the backup and publish a name that sorts below tick 2's,
    # leaving newest_version pointing at stale data
    spark.range(15, 20).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir / "t.parquet"))
    engine.do_copy(load_date=d)
    cat = engine.catalog
    assert cat.newest_version("default", "t_sync") == cat.current_version(
        "default", "t_sync"
    ), "a same-second tick published a name sorting below a retained one"
    assert cat.table_at(spark, "default", "t_sync").count() == 20


def test_incremental_crash_retry_reclaims_unpublished_corpse(spark, tmp_path):
    """A tick that crashes BETWEEN write_version and publish leaves a
    half-written version dir in the listing. The same-load_date retry must
    RECLAIM that name (it was never published — manifest physical/previous
    don't include it), not bump past it: bumping would let keep-2 retention
    count the corpse as the backup and reap the last good version, so
    time-travel/rollback lands on garbage."""
    import glob
    import os
    from datetime import datetime

    from mssql2monetdb_spark.config.spec import CopyJob, JobSpec, SourceSpec
    from mssql2monetdb_spark.engine.copy import CopyEngine

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.parquet(
        str(src_dir / "t.parquet")
    )
    spec = JobSpec(
        sources={"s": SourceSpec(name="s", format="parquet", path=str(src_dir))},
        jobs={
            "j": CopyJob(
                job_id="j",
                source="s",
                from_table="t",
                to_table="t_sync",
                trigger_column="k",
                incremental=True,
            )
        },
        warehouse_dir=str(tmp_path / "wh"),
        state_dir=str(tmp_path / "state"),
    )
    engine = CopyEngine(spark, spec)
    d = datetime(2024, 6, 1)
    engine.do_copy(load_date=d)  # full load -> V0 published
    v0 = engine.catalog.current_version("default", "t_sync")

    # incremental same-second tick that crashes after write, before publish
    spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir / "t.parquet"))
    real_publish = engine.catalog.publish

    def crash_publish(*a, **kw):
        raise RuntimeError("simulated crash between write and publish")

    engine.catalog.publish = crash_publish
    try:
        engine.do_copy(load_date=d)
    except RuntimeError:
        pass
    engine.catalog.publish = real_publish

    versions = engine.catalog.table_versions("default", "t_sync")
    assert len(versions) == 2 and engine.catalog.current_version(
        "default", "t_sync"
    ) == v0, "precondition: corpse retained, manifest still on V0"
    corpse = next(v for v in versions if v != v0)
    # make the corpse visibly half-written: drop its data files
    for f in glob.glob(f"{engine.catalog.version_dir('default', corpse)}/part-*"):
        os.remove(f)

    # retry of the SAME tick (watermark state was never persisted, so the
    # delta re-extracts): must land on the corpse's name, overwriting it
    engine.do_copy(load_date=d)
    cat = engine.catalog
    assert cat.current_version("default", "t_sync") == corpse, (
        "retry bumped past the unpublished corpse instead of reclaiming it"
    )
    assert sorted(cat.table_versions("default", "t_sync")) == sorted([v0, corpse])
    assert cat.manifest_info("default", "t_sync").get("previous") == v0
    assert cat.table_at(spark, "default", "t_sync").count() == 15
    # the keep-2 rollback window holds the last GOOD version, readable
    from mssql2monetdb_spark.engine.publish import version_of

    assert cat.table_at(spark, "default", "t_sync", version_of(v0)).count() == 10

    # a further same-second tick bumps past BOTH published-lineage names
    spark.range(15, 20).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir / "t.parquet"))
    engine.do_copy(load_date=d)
    assert cat.newest_version("default", "t_sync") == cat.current_version(
        "default", "t_sync"
    )
    assert cat.table_at(spark, "default", "t_sync").count() == 20


def test_versioned_catalog_on_hadoop_fs(spark, tmp_path):
    """The catalog's full publish protocol through the HadoopFS store
    interface (round-10 verdict item 5) — exercised against the Hadoop
    local filesystem (file:// URIs), the same code path as HDFS/S3A:
    write -> atomic manifest publish -> read-back, incremental carry in
    'auto' mode (no hard links on Hadoop stores -> degrades to copies)
    and 'manifest' mode (zero carry I/O), ref-counted retention, drop."""
    from datetime import datetime

    from mssql2monetdb_spark.engine.fs import HadoopFS
    from mssql2monetdb_spark.engine.publish import VersionedCatalog

    wh_uri = f"file://{tmp_path}/hwh"
    cat = VersionedCatalog(wh_uri, fs=HadoopFS(spark, wh_uri))

    df1 = spark.createDataFrame([(1, "a", 0), (2, "b", 1)], "k bigint, s string, b int")
    p1 = cat.write_version(df1, "default", "t", datetime(2024, 6, 1), partition_by=["b"])
    cat.publish(spark, "default", "t", p1)
    assert cat.current_version("default", "t") == p1
    assert cat.table_at(spark, "default", "t").count() == 2

    # incremental carry, auto mode: HadoopFS.link raises -> copies
    df2 = spark.createDataFrame([(3, "c", 1)], "k bigint, s string, b int")
    p2 = cat.write_version_incremental(
        df2, "default", "t", datetime(2024, 6, 2), partition_col="b", base_physical=p1
    )
    cat.publish(spark, "default", "t", p2)
    got = {(r["k"], r["s"], r["b"]) for r in cat.table_at(spark, "default", "t").collect()}
    assert got == {(1, "a", 0), (3, "c", 1)}  # b=0 carried, b=1 rewritten

    # manifest mode: untouched partitions carried by reference
    df3 = spark.createDataFrame([(4, "d", 1)], "k bigint, s string, b int")
    p3 = cat.write_version_incremental(
        df3, "default", "t", datetime(2024, 6, 3),
        partition_col="b", base_physical=p2, carry_mode="manifest",
    )
    cat.publish(spark, "default", "t", p3)
    got = {(r["k"], r["s"], r["b"]) for r in cat.table_at(spark, "default", "t").collect()}
    assert got == {(1, "a", 0), (4, "d", 1)}

    # retention: p1 is past keep-2 but hosts p3's referenced b=0 partition
    # via p2's copy... (p3 refs p2, which physically owns both partitions
    # after the copy carry) — p1 has no refs pinning it and is reaped
    dropped = cat.cleanup("default", "t")
    assert p1 in dropped
    assert cat.table_versions("default", "t") == [p3, p2]
    assert {(r["k"],) for r in cat.table_at(spark, "default", "t").select("k").collect()} == {(1,), (4,)}

    # link mode must raise on a store without hard links, by contract
    df4 = spark.createDataFrame([(5, "e", 1)], "k bigint, s string, b int")
    import pytest as _pytest

    with _pytest.raises(OSError, match="hard links"):
        cat.write_version_incremental(
            df4, "default", "t", datetime(2024, 6, 4),
            partition_col="b", base_physical=p3, carry_mode="link",
        )

    cat.drop_table(spark, "default", "t")
    assert not cat.exists("default", "t")


def test_hadoop_fs_write_atomic_falls_back_without_abstract_fs(spark, tmp_path):
    """ADVICE r10: schemes without an AbstractFileSystem binding (S3A's
    fs.AbstractFileSystem.s3a.impl is not in core-default) throw from the
    FileContext rename even though the FileSystem API works — the manifest
    swap must degrade to FileSystem delete+rename instead of failing the
    publish."""
    from mssql2monetdb_spark.engine.fs import HadoopFS

    uri = f"file://{tmp_path}/fbfs"
    hfs = HadoopFS(spark, uri)
    hfs.makedirs(uri)

    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class _BoomFC:
        @staticmethod
        def getFileContext(*a):
            raise Exception(
                "UnsupportedFileSystemException: No AbstractFileSystem for scheme: s3a"
            )

    real_jvm = hfs._jvm
    hfs._jvm = _NS(org=_NS(apache=_NS(hadoop=_NS(fs=_NS(FileContext=_BoomFC)))))
    try:
        hfs.write_atomic(f"{uri}/m.json", '{"v": 1}')
        hfs.write_atomic(f"{uri}/m.json", '{"v": 2}')  # overwrite path too
    finally:
        hfs._jvm = real_jvm
    assert hfs.read_text(f"{uri}/m.json") == '{"v": 2}'
    assert not hfs.exists(f"{uri}/m.json.tmp")
