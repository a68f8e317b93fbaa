"""Deterministic cross-engine hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so oracle-checkable operators derive integer hashes from ``md5``
(identical in both engines) — hex prefix parsed as an integer:

- Spark:  ``conv(substring(md5(x), 1, 8), 16, 10)::bigint``
- DuckDB: ``('0x' || substring(md5(x), 1, 8))::BIGINT``

32 hex bits keep every downstream ``a*h + b`` inside int64 (no overflow:
DuckDB errors on BIGINT overflow, Spark silently wraps — both are wrong).

MinHash uses ``k`` universal-hash permutations ``(a_i * h + b_i) mod P`` with
fixed constants (below) shared verbatim by the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^61 - 1; a*h+b < 2^30 * 2^32 + 2^30 < 2^63 stays in int64.
MINHASH_PRIME = 2305843009213693951

#: Deterministic (a, b) pairs for the k=16 MinHash permutations, generated
#: once from the LCG x -> (1103515245*x + 12345) mod 2^30 seeded at 42
#: (values inlined so the oracle SQL can embed the exact same constants).
_LCG_M = 1 << 30


def _lcg_stream(seed: int, n: int) -> list[int]:
    xs, x = [], seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % _LCG_M
        xs.append(x | 1)  # odd => nonzero, coprime-ish with 2^k
    return xs


MINHASH_K = 16
MINHASH_A = _lcg_stream(42, MINHASH_K)
MINHASH_B = _lcg_stream(4242, MINHASH_K)


def md5_int32(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative BIGINT (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_int32_sql(expr: str) -> str:
    """DuckDB fragment equivalent to :func:`md5_int32`."""
    return f"(('0x' || substring(md5({expr}), 1, 8))::BIGINT)"


def md5_int60(col: Column) -> Column:
    """First 60 bits of md5(col) as BIGINT — exact-dedup grade collision
    resistance while staying positive int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def minhash_sig(shingle_hashes: Column, i: int) -> Column:
    """The i-th MinHash signature value over an array of int32 hashes."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return F.array_min(
        F.transform(
            shingle_hashes,
            lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME),
        )
    )


def minhash_sig_sql(hashes_expr: str, i: int) -> str:
    """DuckDB fragment equivalent to :func:`minhash_sig`."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return f"list_min(list_transform({hashes_expr}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
