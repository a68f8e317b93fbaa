"""Snapshot one query's `.explain("formatted")` to plans/r11/<name>_<tag>.txt.

Usage: plan_snapshot.py <tag> name1 [name2 ...]

The optimization-round evidence trail: run with tag=before prior to touching
a query, tag=after once done; the judge diffs the two files against the
claims in OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssql2monetdb_spark.queries.registry import REGISTRY  # noqa: E402
from mssql2monetdb_spark.session import get_spark  # noqa: E402
import mssql2monetdb_spark.queries  # noqa: E402,F401

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r11"


def main() -> int:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    tag, names = sys.argv[1], sys.argv[2:]
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-snapshot")
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = OUT_DIR / f"{name}_{tag}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
