"""Run the FULL registry Spark-vs-DuckDB on an adversarial edge corpus.

The driver fixtures (seed=42 TPC-H-ish tables) are well-behaved: no empty
strings, no unicode, no tied timestamps, no single-row groups. Every past
ADVICE finding of the oracle-divergence class (sketch empty/singleton
edges, properties separator semantics) lived exactly in inputs the
fixtures never produce. This probe closes that blind spot wholesale: a
hand-built corpus where every table is small but hostile —

- documents: empty text, whitespace-only, one-token, unicode (CJK /
  emoji / combining accents), repeated-token spam, an exact-duplicate
  cluster, near-duplicates, a 5k-char doc, punctuation-only
- events: tied (user_id, ts) pairs (tie-break by event_id), identical
  consecutive timestamps, exact-gap boundaries, a user with ONE event,
  a pre-epoch event, value = 0/negative/1e18, single-quote JSON props
- embeddings: negative components, tiny denormals, near-parallel pairs,
  an exact-duplicate vector (zero vectors stay out: cosine's documented
  contract assumes non-zero embeddings)
- TPC-H tables: ~40 rows with full referential integrity, one customer
  with no orders, one order with no lineitems, negative acctbal,
  zero-discount/zero-tax rows, same-day ship dates

and every queries() entry runs against its oracle_sql() through the SAME
canonicalize/compare harness the driver gate uses. Agreement here is a
much stronger exactness statement than agreement on friendly data.

Expected-divergence notes (triaged, not failures): none — a clean run
prints ALL MATCH and the count.

Usage: python scripts/edge_corpus_probe.py [--only name1,name2] [--keep]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import pyarrow as pa
import pyarrow.parquet as pq

EDGE_DIR = "/tmp/edge_corpus"
DIM = 64


def _ts_ms(items):
    return pa.array(items, type=pa.timestamp("ms"))


def _ts_ns(items):
    return pa.array(items, type=pa.timestamp("ns"))


def build_corpus() -> None:
    from datetime import datetime

    os.makedirs(EDGE_DIR, exist_ok=True)

    def write(name, table):
        pq.write_table(table, f"{EDGE_DIR}/{name}.parquet")

    # --- region / nation: tiny dims with unicode names -------------------
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array([0, 1, 2], type=pa.int32()),
                "r_name": ["AMERICA", "ASIE ÉTENDUE", "亜細亜"],
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2, 3], type=pa.int32()),
                "n_name": ["BRÉSIL", "JAPAN", "", "N4"],
                "n_regionkey": pa.array([0, 2, 1, 0], type=pa.int32()),
            }
        ),
    )
    # --- customer: one with NO orders (key 104), negative balance --------
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([101, 102, 103, 104], type=pa.int64()),
                "c_name": ["Customer#101", "Cust ü102", "c", ""],
                "c_nationkey": pa.array([0, 1, 2, 3], type=pa.int32()),
                "c_acctbal": [0.0, -999.99, 1e9, 0.01],
                "c_mktsegment": ["BUILDING", "BUILDING", "AUTOMOBILE", "MACHINERY"],
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array([201, 202], type=pa.int64()),
                "s_name": ["Supplier#201", "Süpplier 202"],
                "s_nationkey": pa.array([0, 1], type=pa.int32()),
                "s_acctbal": [-1.5, 0.0],
            }
        ),
    )
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array([301, 302, 303], type=pa.int64()),
                "p_name": ["green tomato", "GREEN steel thing", "x"],
                "p_brand": ["Brand#1", "Brand#1", "Brand#2"],
                "p_type": ["ECONOMY ANODIZED STEEL", "SMALL PLATED COPPER", "PROMO BURNISHED TIN"],
                "p_size": pa.array([1, 50, 0], type=pa.int32()),
                "p_retailprice": [0.01, 100.0, 99999.99],
            }
        ),
    )
    # --- orders: one with NO lineitems (404); equal order dates (ties) ---
    d1 = datetime(1995, 3, 1, 0, 0, 0)
    d2 = datetime(1995, 3, 1, 0, 0, 0)  # tie with d1 on purpose
    d3 = datetime(1992, 1, 1, 23, 59, 59)
    d4 = datetime(1998, 12, 31, 0, 0, 0)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([401, 402, 403, 404], type=pa.int64()),
                "o_custkey": pa.array([101, 101, 102, 103], type=pa.int64()),
                "o_orderstatus": ["O", "F", "O", "F"],
                "o_totalprice": [0.0, 123.45, 1e7, 50.0],
                "o_orderdate": _ts_ms([d1, d2, d3, d4]),
                "o_orderpriority": ["1-URGENT", "5-LOW", "1-URGENT", "3-MEDIUM"],
            }
        ),
    )
    ship = datetime(1995, 3, 2)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([401, 401, 402, 403, 403, 403], type=pa.int64()),
                "l_partkey": pa.array([301, 302, 301, 303, 303, 302], type=pa.int64()),
                "l_suppkey": pa.array([201, 202, 201, 202, 201, 201], type=pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1, 2, 3], type=pa.int32()),
                "l_quantity": [0.0, 1.0, 50.0, 2.0, 2.0, 3.0],
                "l_extendedprice": [0.0, 10.5, 5000.0, 20.0, 20.0, 33.3],
                "l_discount": [0.0, 0.1, 0.05, 0.0, 0.0, 1.0],
                "l_tax": [0.0, 0.0, 0.08, 0.02, 0.02, 0.0],
                "l_returnflag": ["N", "R", "A", "N", "N", "R"],
                "l_linestatus": ["O", "F", "F", "O", "O", "F"],
                "l_shipdate": _ts_ms([ship, ship, ship, datetime(1992, 2, 2), datetime(1992, 2, 2), datetime(1998, 12, 31)]),
            }
        ),
    )
    # --- events: ties, exact gaps, single-event user, pre-epoch ----------
    base = datetime(2024, 3, 10, 1, 30, 0)  # US DST-transition morning

    def at(sec_offset: int):
        from datetime import timedelta

        return base + timedelta(seconds=sec_offset)

    rows = [
        # user 1: tied timestamps (ordering falls to event_id), exact 1800s
        # gap (stays in session), 1801s gap (splits)
        (1, at(0), 1, "view", 0.0, '{"k": 1}'),
        (2, at(0), 1, "click", -5.5, '{"k": "it\'s"}'),
        (3, at(1800), 1, "view", 1e18, "{}"),
        (4, at(3601), 1, "purchase", 2.5, '{"deep": {"a": [1, 2]}}'),
        # funnel exactly at the within_s boundary for user 2
        (5, at(0), 2, "view", 1.0, "{}"),
        (6, at(86400), 2, "click", 1.0, "{}"),  # t_step1 + within_s exactly
        (7, at(86400 + 86400), 2, "purchase", 1.0, "{}"),
        # user 3: ONE event
        (8, at(500), 3, "view", 7.0, "{}"),
        # user 4: pre-epoch event then a 2024 event (giant gap)
        (9, datetime(1969, 12, 31, 23, 0, 0), 4, "view", 0.5, "{}"),
        (10, at(100), 4, "click", 0.5, "{}"),
        # user 5: same type repeated (self-transitions)
        (11, at(0), 5, "view", 1.0, "{}"),
        (12, at(10), 5, "view", 1.0, "{}"),
        (13, at(20), 5, "view", 1.0, "{}"),
    ]
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": _ts_ns([r[1] for r in rows]),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": [r[4] for r in rows],
                "props": [r[5] for r in rows],
            }
        ),
    )
    # --- documents: the hostile text set ---------------------------------
    docs = [
        (1, "", "en", "web"),                              # empty text
        (2, "   \t  \n ", "en", "web"),                    # whitespace only
        (3, "word", "en", "web"),                          # single token
        (4, "the the the the the the", "en", "web"),       # repeated-token spam
        (5, "こんにちは 世界 こんにちは", "ja", "web"),  # CJK
        (6, "café café naïve", "fr", "web"),  # combining accents
        (7, "\U0001f600 \U0001f680 emoji text \U0001f600", "en", "social"),
        (8, "!!! ??? ... ---", "en", "web"),               # punctuation only
        (9, "alpha beta gamma delta epsilon", "en", "book"),
        (10, "alpha beta gamma delta epsilon", "en", "web"),   # exact dup of 9
        (11, "alpha beta gamma delta epsilon", "en", "web"),   # exact dup again
        (12, "alpha beta gamma delta zeta", "en", "web"),      # near-dup of 9
        (13, "a " * 2500, "en", "gen"),                    # long doc, one token repeated
        (14, "The quick brown fox jumps over the lazy dog", "en", "book"),
        (15, "the quick brown fox jumps over the lazy dog", "en", "web"),  # case variant
        (16, "supercalifragilisticexpialidocious", "en", "web"),  # one long token
        (17, "mixed CASE Text With Unicode ÜMLÄUT", "de", "web"),
        (18, "1 2 3 4 5 6 7 8 9 10", "en", "data"),
        (19, "tab\tseparated\ttokens\there", "en", "data"),
        (20, "new\nline\nseparated\nwords", "en", "data"),
    ]
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
                "text": [d[1] for d in docs],
                "lang": [d[2] for d in docs],
                "source": [d[3] for d in docs],
                "n_chars": pa.array([len(d[1]) for d in docs], type=pa.int64()),
            }
        ),
    )
    # --- embeddings: adversarial but non-zero ----------------------------
    import math

    def vec(seed: int) -> list[float]:
        # deterministic LCG floats in [-1, 1), float32-representable
        x = seed * 2654435761 % (2**32)
        out = []
        for _ in range(DIM):
            x = (1103515245 * x + 12345) % (2**31)
            out.append(round(x / 2**30 - 1.0, 6))
        return out

    v0 = vec(1)
    near = [round(c + (0.001 if i == 0 else 0.0), 6) for i, c in enumerate(v0)]
    tiny = [1e-30 if i % 2 == 0 else -1e-30 for i in range(DIM)]  # denormal-ish
    neg = [-abs(c) - 0.01 for c in vec(7)]
    # vec_ids MUST be 0-based dense: centroid/codebook seeding documents
    # ids 0..k-1 as its contract (similarity.py caaaea0) and raises loudly
    # otherwise — the probe stays in-contract so the six ANN/semantic
    # queries exercise their math, not the guard.
    embs = [
        (0, v0, 0),
        (1, v0, 0),          # exact duplicate vector
        (2, near, 0),        # near-parallel
        (3, [-c for c in v0], 1),  # anti-parallel
        (4, tiny, 1),
        (5, neg, 1),
        (6, vec(3), 2),
        (7, vec(4), 2),
        (8, vec(5), 2),
        (9, vec(6), 2),
    ]
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array([e[0] for e in embs], type=pa.int64()),
                "embedding": pa.array([e[1] for e in embs], type=pa.list_(pa.float32())),
                "label": pa.array([e[2] for e in embs], type=pa.int32()),
            }
        ),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--keep", action="store_true", help="keep an existing corpus dir")
    args = ap.parse_args()

    if not args.keep and os.path.exists(EDGE_DIR):
        shutil.rmtree(EDGE_DIR)
    if not os.path.exists(EDGE_DIR):
        build_corpus()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("edge-corpus-probe")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    from oracle_harness import duckdb_connection, compare_frames

    qs = mod.queries()
    osql = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            sys.exit(f"error: --only names not in queries(): {unknown}")

    duck = duckdb_connection(EDGE_DIR)
    bad, rows_only, n_ok = [], [], 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in osql:
            rows_only.append(name)
            continue
        try:
            spark_pdf = fn(spark, EDGE_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"SPARK_ERR {type(exc).__name__}: {exc}"))
            traceback.print_exc(limit=2)
            continue
        try:
            oracle_pdf = duck.execute(osql[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ORACLE_ERR {type(exc).__name__}: {exc}"))
            continue
        problems = compare_frames(spark_pdf, oracle_pdf)
        if problems:
            bad.append((name, "; ".join(problems)))
        else:
            n_ok += 1
    print(f"edge corpus: {n_ok} MATCH, {len(bad)} problems, {len(rows_only)} rows-only skipped")
    for name, why in bad:
        print(f"  {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
