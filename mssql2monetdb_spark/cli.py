"""CLI — reference flag parity (op #28, ``CopyToolConfig.java:116-279``).

    python -m mssql2monetdb_spark -c spec.json            # full 4-phase run
    python -m mssql2monetdb_spark -c spec.json --no-switch    # phases 1-2
    python -m mssql2monetdb_spark -c spec.json --switch-only  # phases 3-4
    python -m mssql2monetdb_spark -c spec.json --scheduler    # polling loop
    python -m mssql2monetdb_spark -c spec.json --query "SELECT ..."

Exit codes: 0 = success, 1 = error, 2 = no new data
(``CopyTool.java:66-68,95-106``).
"""

from __future__ import annotations

import argparse
import logging
import sys

from .config.spec import SpecError, load_spec
from .engine.copy import EXIT_ERROR, CopyEngine
from .engine.scheduler import run_scheduled
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mssql2monetdb_spark",
        description="PySpark-native copy/query engine (reference: mssql2monetdb CopyTool)",
    )
    p.add_argument(
        "-c",
        "--config",
        help="job spec: JSON file, or a reference-format .properties file "
        "(CopyToolConfig.java:116-279 — requires --warehouse as the copy "
        "target, standing in for the monetdb.* connection block)",
    )
    p.add_argument(
        "--switch-table",
        help="config-less switch-only mode: publish the newest loaded version "
        "of this table (requires --warehouse; reference CopyToolConfig.java:219-249)",
    )
    p.add_argument(
        "--warehouse", help="warehouse dir for --switch-table / .properties configs"
    )
    mode = p.add_mutually_exclusive_group()
    mode.add_argument(
        "--no-switch", action="store_true", help="run phases 1-2 only (load, don't publish)"
    )
    mode.add_argument(
        "--switch-only",
        action="store_true",
        help="run phases 3-4 only (publish newest loaded versions)",
    )
    p.add_argument(
        "--scheduler",
        action="store_true",
        help="poll forever on the spec's scheduler_interval",
    )
    p.add_argument("--max-runs", type=int, default=None, help="scheduler iterations (testing)")
    p.add_argument(
        "--monetdb-sink",
        action="store_true",
        help="with a .properties config: honor its monetdb.* target block as "
        "a JDBC warehouse sink (versioned tables + view switch on the server) "
        "instead of the parquet warehouse",
    )
    p.add_argument("--query", help="after the run, execute this SQL on the published views")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    # config-less single-table switch mode (CopyToolConfig.java:219-249)
    if args.switch_table:
        if not args.warehouse:
            print("error: --switch-table requires --warehouse", file=sys.stderr)
            return EXIT_ERROR
        from .engine.publish import VersionedCatalog

        spark = get_spark("mssql2monetdb-cli")
        cat = VersionedCatalog(args.warehouse)
        schema, _, table = args.switch_table.rpartition(".")
        schema = schema or "default"
        physical = cat.newest_version(schema, table)
        if physical is None:
            print(f"error: no loaded version for {schema}.{table}", file=sys.stderr)
            return EXIT_ERROR
        cat.publish(spark, schema, table, physical)
        cat.cleanup(schema, table)
        print(f"published {schema}.{table} -> {physical}")
        return 0

    if not args.config:
        print("error: -c/--config is required (or use --switch-table)", file=sys.stderr)
        return EXIT_ERROR
    try:
        if args.config.endswith(".properties"):
            if not args.warehouse:
                print(
                    "error: a .properties config requires --warehouse "
                    "(the Spark-side copy target)",
                    file=sys.stderr,
                )
                return EXIT_ERROR
            from .config.properties import load_properties_spec

            spec = load_properties_spec(
                args.config,
                warehouse_dir=args.warehouse,
                monetdb_sink=args.monetdb_sink,
            )
        else:
            spec = load_spec(args.config)
    except (SpecError, OSError, ValueError) as exc:
        print(f"error: invalid spec: {exc}", file=sys.stderr)
        return EXIT_ERROR

    spark = get_spark("mssql2monetdb-cli")
    engine = CopyEngine(spark, spec)

    # failure mails exactly like the reference (EmailUtil.java:21-111):
    # configured from the spec's mail block, sent on any job error
    notify = None
    if spec.mail is not None:
        from .engine.notify import smtp_notifier

        notify = smtp_notifier(spec.mail)

    if args.scheduler:
        interval = spec.scheduler_interval or "every 1 minute"
        run_scheduled(
            lambda: engine.run(
                no_switch=args.no_switch, switch_only=args.switch_only, notify=notify
            ),
            interval,
            max_runs=args.max_runs,
        )
        code = 0
    else:
        code = engine.run(
            no_switch=args.no_switch, switch_only=args.switch_only, notify=notify
        )

    if args.query and code != EXIT_ERROR:
        engine.catalog.register_all(spark)
        for line in engine.sql(args.query).toJSON().collect():
            print(line)
    return code


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
