"""Simulate the driver: vanilla session, driver-contract surface only.

Usage: drive_entry.py [--only name1,name2,...] [--tz America/New_York]

--only restricts the oracle comparison to the named queries (targeted
re-drive after a change). --tz sets the SESSION timezone, simulating a
driver in another zone — the probe that catches any timestamp oracle not
forced through UTC (see .claude/skills/verify/SKILL.md).
"""
import sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

def _flag_value(flag):
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv):
        sys.exit(f"error: {flag} requires a value")
    return sys.argv[i + 1]

only_arg = _flag_value("--only")
only = set(only_arg.split(",")) if only_arg is not None else None
tz = _flag_value("--tz")

# vanilla session: NO engine tuning, like an external driver would build
builder = (SparkSession.builder.appName("driver-sim").master("local[8]")
           .config("spark.ui.enabled", "false")
           .config("spark.ui.showConsoleProgress", "false"))
if tz:
    builder = builder.config("spark.sql.session.timeZone", tz)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod

# 1. smoke: entry()
df = mod.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", [f.name for f in df.schema])
assert len(rows) > 0

# 2. full contract listing
qs = mod.queries()
osql = mod.oracle_sql()
print("QUERIES:", len(qs), "ORACLES:", len(osql), "rows-only:", sorted(set(qs) - set(osql)))

# A typo in --only must fail LOUDLY: silently matching zero queries and
# exiting 0 would read as "all oracles match" to the verify workflow.
if only is not None:
    unknown = sorted(only - set(qs))
    if unknown:
        sys.exit(f"error: --only names not in queries(): {unknown}")

# 3. side-by-side at sf0.01, driver style
sys.path.insert(0, "/root/repo/tests")
from oracle_harness import duckdb_connection, compare_frames
sf = "/root/testdata/sf0.01"
duck = duckdb_connection(sf)
bad = []
for name, fn in sorted(qs.items()):
    if only is not None and name not in only:
        continue
    sdf = fn(spark, sf)
    spdf = sdf.toPandas()
    if name in osql:
        opdf = duck.sql(osql[name]).df()
        probs = compare_frames(spdf, opdf)
        status = "MATCH" if not probs else "MISMATCH: " + "; ".join(probs)
    else:
        status = f"rows-only ({len(spdf)} rows)"
    if "MISMATCH" in status:
        bad.append(name)
    print(f"  {name}: {status}")
print("RESULT:", "ALL MATCH" if not bad else f"FAILURES: {bad}")
sys.exit(1 if bad else 0)
