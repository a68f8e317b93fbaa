"""Regenerate PLANS.md: the physical plan of every headline (bench) query.

The plan dump is the evidence that scale-critical properties hold — filters
reach the scan (PushedFilters), projections prune (ReadSchema), dimensions
broadcast, top-k avoids global sorts. Run after changing any query:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.queries.registry import bench_queries  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark("plan-dump")
    out = [
        "# PLANS — physical plans of the headline queries (generated)",
        "",
        f"`spark.explain('formatted')` at {SF_DIR}; regenerate with",
        "`python scripts/dump_plans.py`. What to look for: `PushedFilters`",
        "(predicates at the scan), `ReadSchema` (column pruning),",
        "`BroadcastHashJoin` (dimension joins), `TakeOrderedAndProject`",
        "(top-k without global sort), paired `HashAggregate`s (map-side",
        "partial aggregation).",
        "",
    ]
    for name, q in sorted(bench_queries().items()):
        df = q.build(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}")
        out.append("")
        if q.doc:
            out.append(q.doc.strip().splitlines()[0])
            out.append("")
        out.append("```")
        # keep the operator tree + the scan details; drop the verbose
        # per-node input/output column listings to stay readable
        lines = buf.getvalue().splitlines()
        tree_end = next(
            (i for i, ln in enumerate(lines) if ln.startswith("(1)")), len(lines)
        )
        keep = lines[:tree_end]
        details = [
            ln
            for ln in lines[tree_end:]
            if ln.startswith(("(", "PushedFilters", "ReadSchema", "PartitionFilters"))
            and not ln.startswith("(число")
        ]
        out.extend(keep)
        out.extend(details)
        out.append("```")
        out.append("")
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(bench_queries())} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
