"""Graph analytics over relational frames: weighted PageRank by power
iteration.

Reference parity: the reference delegates analytics to warehouse SQL;
iterative graph scoring is the one shape plain SQL can't express without a
driver (or a recursive CTE of fixed depth) — re-expressed here as a fixed
number of join+aggregate rounds, the same loop skeleton as
``dedup.connected_components``.

Cross-engine determinism: every per-node incoming sum is a FIXED-ORDER
fold (sorted ``collect_list`` + ``F.aggregate`` on the Spark side,
``list(... ORDER BY)`` + ``list_reduce`` in DuckDB) — a plain SUM of
doubles would hash differently across engines because float addition is
not associative. Edges are pre-aggregated to unique (src, dst) pairs so
the fold key (src) is unique within each dst group.

Scale shape: each iteration is one hash join (edges ⋈ ranks, both keyed
on src) plus one aggregate keyed on dst — two shuffles per iteration,
state bounded by |V| + |E|, no driver-side data motion beyond the single
|V| scalar. Lineage growth across iterations is linear in the (small,
fixed) iteration count; callers running tens of iterations should
``localCheckpoint`` every few rounds like connected components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import parallelized

PR_DAMPING = 0.85
PR_ITERATIONS = 4


def user_transition_edges(events: DataFrame) -> DataFrame:
    """Directed weighted user graph from the event stream: an edge
    ``u -> v`` for each consecutive pair of events of the SAME type
    (ordered by ``(ts, event_id)``) produced by different users, weighted
    by transition count. One window per event type, one aggregate — the
    standard interaction-graph extraction."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = (
        parallelized(events)
        .select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    return pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("weight")
    )


def user_transition_edges_sql(table: str) -> str:
    """DuckDB fragment matching :func:`user_transition_edges`."""
    return f"""
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS weight
        FROM (
            SELECT user_id AS src,
                   LEAD(user_id) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS dst
            FROM {table}
        )
        WHERE dst IS NOT NULL AND dst <> src
        GROUP BY src, dst
    """


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = PR_ITERATIONS,
    damping: float = PR_DAMPING,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank, ``iterations`` rounds of power iteration from a
    uniform start: ``r'(v) = (1-d)/N + d * Σ_u r(u) * w(u,v)/outdeg(u)``
    (dangling mass deliberately not redistributed — the fixed-depth SQL
    oracle defines the same recurrence). Returns (node, rank).

    Fault-tolerance contract (probed with live executor SIGKILLs,
    SCALE.md round 10): the default pure-lineage form survives executor
    loss — every lost block recomputes, and the shared edge-derivation
    shuffle is a ReusedExchange across iterations so lineage costs no
    extra wall-clock at shallow depth. ``checkpoint_every`` opts deep
    loops (tens of iterations, where plan growth dominates) into
    ``localCheckpoint`` rank truncation — faster planning but a lost
    executor then FAILS the job loudly (localCheckpoint blocks are not
    recomputable, by Spark contract); rerun or use a reliable checkpoint
    dir when preemption is routine."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # |V|: one scalar to the driver, like every bounds probe
    outdeg = edges.groupBy("src").agg(F.sum("weight").alias("outdeg"))
    e = edges.join(outdeg, "src").select(
        "src",
        "dst",
        (F.col("weight").cast("double") / F.col("outdeg").cast("double")).alias(
            "share"
        ),
    )
    base = (F.lit(1.0) - F.lit(damping)) / F.lit(float(n))
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    for it in range(iterations):
        if checkpoint_every and it and it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
        contribs = e.join(ranks, e["src"] == ranks["node"]).select(
            "dst", "src", (F.col("rank") * F.col("share")).alias("contrib")
        )
        # fixed-order fold: src is unique per dst (edges pre-aggregated)
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("in_sum")
        )
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks.orderBy("node")


def pagerank_sql(
    edges_fragment: str,
    *,
    iterations: int = PR_ITERATIONS,
    damping: float = PR_DAMPING,
) -> str:
    """DuckDB query matching :func:`pagerank` round-for-round: the fixed
    iteration count unrolls into chained CTEs; per-node sums use the same
    fixed-order fold (``list(... ORDER BY src)`` + ``list_reduce``)."""
    parts = [
        f"WITH edges AS ({edges_fragment})",
        """nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst AS node FROM edges
            )
        )""",
        "nstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        """e AS (
            SELECT edges.src, edges.dst,
                   CAST(weight AS DOUBLE) / CAST(outdeg AS DOUBLE) AS share
            FROM edges JOIN (
                SELECT src, SUM(weight) AS outdeg FROM edges GROUP BY src
            ) o USING (src)
        )""",
        "r0 AS (SELECT node, 1.0 / s.n AS rank FROM nodes CROSS JOIN nstats s)",
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""r{i} AS (
            SELECT nd.node,
                   (1.0 - {damping}) / s.n
                   + {damping} * COALESCE(t.in_sum, 0.0) AS rank
            FROM nodes nd CROSS JOIN nstats s
            LEFT JOIN (
                SELECT dst, list_reduce(
                           list_prepend(0.0, list(contrib ORDER BY src)),
                           (acc, x) -> acc + x
                       ) AS in_sum
                FROM (
                    SELECT e.dst, e.src, r.rank * e.share AS contrib
                    FROM e JOIN r{i - 1} r ON e.src = r.node
                )
                GROUP BY dst
            ) t ON nd.node = t.dst
        )""")
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank FROM r{iterations} ORDER BY node"
    )


def reachability(
    edges: DataFrame, seeds: DataFrame, *, max_hops: int = 3
) -> DataFrame:
    """Min-depth BFS from a seed set, ``max_hops`` rounds: per hop one
    hash join (frontier ⋈ edges on src), a distinct, and an anti-join
    against the visited set — frontier and visited are both bounded by
    |V|, so a hop never materializes path multiplicity (the recursive-CTE
    UNION ALL blowup). Returns (node, depth) with the first-reached
    (minimum) depth per node, seeds at depth 0."""
    visited = seeds.select("node", F.lit(0).alias("depth"))
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("depth"))
        )
        visited = visited.unionAll(nxt)
        frontier = nxt.select("node")
    return visited.orderBy("node")
