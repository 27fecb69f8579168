"""Weighted-graph analytics over edge DataFrames (engine addition —
standard pipeline telemetry over the engine's own flow graphs, e.g.
the tile-transition edges).

``pagerank_exact`` runs a FIXED number of power iterations entirely in
scaled-integer arithmetic, so every intermediate is an exact int64 and
the whole computation replays bit-for-bit in SQL (unrolled rounds) —
unlike float PageRank, whose per-node sums are order-dependent.  The
damping constant d = 0.85 becomes the exact rational 17/20:
``new_pr = (3*SCALE) // (20*N)  +  (17 * sum_contribs) // 20``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12


def pagerank_exact(edges: DataFrame, iterations: int = 3,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: str = "weight") -> DataFrame:
    """Exact-integer weighted PageRank, ``iterations`` power rounds.

    Per round: each node's rank splits across its out-edges
    proportionally to weight with floor division
    (``contrib = (pr * w) // out_total``), received contributions are
    exact int64 sums, and damping applies as the rational 17/20.
    Dangling mass (nodes without out-edges) is dropped, the standard
    simplification — totals shrink slightly per round, rankings are
    unaffected for flow-graph use.

    Scale shape: per round, ONE join of the edge table with the
    (node, pr) frame on src + one aggregate on dst + one left join
    back to the node set — the alternating-star CC pattern's cost
    model; for long iteration counts localCheckpoint between rounds
    (exactly as operators/dedup.connected_components does) keeps the
    plan bounded.  Here the round count is a small constant, so the
    unrolled plan is fine and the SQL oracle mirrors it verbatim.

    Output: (node, pr_e12:long) — pr scaled by 1e12.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one scalar agg, documented pattern
    base = (3 * SCALE) // (20 * n_nodes)
    out_tot = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = e.join(out_tot, "src")

    pr = nodes.withColumn("pr", F.lit(SCALE // n_nodes).cast("long"))
    for _ in range(iterations):
        # `div` keeps the arithmetic in int64: pr*w reaches ~1e16,
        # beyond double's 2^53 integer range, so a float division +
        # cast would misfloor
        contribs = (
            e.join(pr, e.src == pr.node)
            .select("dst", F.expr("(pr * w) div out_w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            F.expr(f"{base}L + (17 * coalesce(s, 0L)) div 20").alias("pr"),
        )
    return pr.select(F.col("node"), F.col("pr").alias("pr_e12"))
