"""Property-based cross-checks (hypothesis) for the graph operators:
random small graphs vs brute-force Python references. One shared Spark
session; examples kept small so each property runs a handful of tiny
jobs. deadline=None because Spark job latency is not the property under
test."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from mssql2monetdb_spark.operators import graph

edge_lists = st.lists(
    st.tuples(st.integers(1, 9), st.integers(1, 9)),
    min_size=0,
    max_size=16,
)


def _und(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def _brute_triangles(und):
    nodes = sorted({n for e in und for n in e})
    counts = {}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= und:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _brute_k_core(und, k):
    und = set(und)
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            return deg
        und = {(a, b) for a, b in und if a not in low and b not in low}


@settings(max_examples=15, deadline=None)
@given(edge_lists)
def test_triangle_counts_match_bruteforce(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in edges] or [(0, 0, 1)],
        "src bigint, dst bigint, weight bigint",
    )
    got = {r["node"]: r["n_triangles"] for r in graph.triangle_counts(df).collect()}
    assert got == _brute_triangles(_und(edges))


@settings(max_examples=10, deadline=None)
@given(edge_lists, st.integers(1, 4))
def test_k_core_matches_bruteforce(spark, edges, k):
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in edges] or [(0, 0, 1)],
        "src bigint, dst bigint, weight bigint",
    )
    got = {r["node"]: r["core_degree"] for r in graph.k_core(df, k).collect()}
    assert got == _brute_k_core(_und(edges), k)


# -- winnowing guarantee (dedup family, colocated for the shared session) --

texts = st.text(alphabet="abcdefghij ", min_size=0, max_size=60)


@settings(max_examples=12, deadline=None)
@given(texts, texts, st.text(alphabet="klmnopqrs", min_size=25, max_size=40))
def test_winnow_guarantee_random(spark, left, right, shared):
    """Any two docs sharing a substring of >= w+k-1 (23) normalized chars
    must share at least one selected fingerprint (Schleimer et al. Thm 1);
    the shared block uses a disjoint alphabet so the property is exact."""
    from mssql2monetdb_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, left + shared), (2, shared + right)], "doc_id bigint, text string"
    )
    pairs = dedup.winnow_fingerprint_pairs(docs, min_shared=1, df_cap=10).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
