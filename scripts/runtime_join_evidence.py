"""Capture the AQE-final executed plan at sf0.1 for the SMJ->SHJ evidence.

Usage: runtime_join_evidence.py name1 [name2 ...]

The maxShuffledHashJoinLocalMapThreshold rewrite (commit 14bdb76) is
runtime-only: static `explain` and the fingerprint gate cannot show it.
This runs each query to completion and writes the executed plan to
plans/r11/<name>_runtime_joins.txt with SMJ/SHJ node counts up top.

Two gotchas this script learned the hard way:
- A noop-sink write runs through its OWN QueryExecution, so the
  DataFrame's AdaptiveSparkPlan stays isFinalPlan=false (the write's
  finalized plan is not reachable from the df). The action here is
  ``collect()`` — fine for registry queries, whose outputs are small —
  which finalizes the df's own adaptive plan.
- At sf0.01 every candidate join collapses to a broadcast, so the
  rewrite has nothing to act on there — capture at sf0.1.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.queries.registry import REGISTRY  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r11"


def main() -> int:
    names = sys.argv[1:]
    if not names:
        sys.exit(__doc__)
    spark = get_spark("runtime-join-evidence")
    from mssql2monetdb_spark.engine import caches

    thr = spark.conf.get("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        nrows = len(df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        shj = len(re.findall(r"ShuffledHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        final = "isFinalPlan=true" in plan
        header = (
            f"Executed plan after collect() ({nrows} rows) at {SF_DIR} with\n"
            f"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold={thr}\n"
            f"(isFinalPlan=true present: {final}; counts span initial+final sections):\n"
            f"ShuffledHashJoin nodes: {shj}\n"
            f"SortMergeJoin nodes: {smj}\n\n"
        )
        path = OUT_DIR / f"{name}_runtime_joins.txt"
        path.write_text(header + plan)
        print(f"{name}: SHJ={shj} SMJ={smj} -> {path}")
        caches.release()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
