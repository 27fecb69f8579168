"""Trajectory-family soak: hop stats, tile transitions and the OD
matrix over millions of synthesized fixes, validated by exact
invariants (no ground-truth materialization needed):

1. trajectory_stats: sum(n_fixes) == input rows; every trajectory
   present; n_hops == n_fixes - 1 per trajectory (dense seq ids).
2. tile_transitions: total transition count == hop count minus the
   same-tile hops (recomputed independently via a second lag pass).
3. od_matrix: sum(n_trips) == number of trajectories.
4. pagerank over the transition graph: mass bounded by SCALE, every
   graph node ranked.

Fixes are derived points (same exact-rational construction as the
contract queries) with traj = id // 8, seq = id % 8.

Usage: python tools/trajectory_soak.py [n_fixes] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n: int = 10_000_000, cpus: int = 16) -> None:
    from pyspark.sql import Window, functions as F

    from s2_geometry_rust_spark.functions import cell_parent
    from s2_geometry_rust_spark.functions.udfs import cell_id_from_xyz
    from s2_geometry_rust_spark.operators.geom_aggs import trajectory_stats
    from s2_geometry_rust_spark.operators.graph import SCALE, pagerank_exact
    from s2_geometry_rust_spark.operators.tiling import (
        od_matrix,
        tile_transitions,
    )
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("traj-soak", cpus=cpus)
    k = F.col("id")
    raw = spark.range(n, numPartitions=cpus * 4).select(
        (k / 8).cast("long").alias("traj_id"),
        F.pmod(k, F.lit(8)).alias("seq"),
        ((k * 37 % 997) / 498.5 - 1.0).alias("x"),
        ((k * 73 % 991) / 495.5 - 1.0).alias("y"),
        ((k * 101 % 983) / 491.5 - 1.0).alias("z"),
    )
    cells = raw.withColumn("cell_id", cell_id_from_xyz("x", "y", "z"))
    cells.persist().count()
    n_trajs = n // 8 + (1 if n % 8 else 0)

    t0 = time.time()
    # normalized points for the hop stats (chord space needs unit vecs)
    nrm = F.sqrt(F.col("x")**2 + F.col("y")**2 + F.col("z")**2)
    pts = cells.select(
        "traj_id", "seq",
        (F.col("x") / nrm).alias("x"),
        (F.col("y") / nrm).alias("y"),
        (F.col("z") / nrm).alias("z"),
    )
    ts = trajectory_stats(pts).persist()
    agg = ts.agg(F.sum("n_fixes"), F.sum("n_hops"), F.count("*")).collect()[0]
    assert agg[0] == n, (agg[0], n)
    assert agg[2] == n_trajs
    total_hops = agg[1]
    assert total_hops == n - n_trajs  # dense seq: hops = fixes - trajs
    t_stats = time.time() - t0

    t0 = time.time()
    trans = tile_transitions(cells, level=8).persist()
    n_trans = trans.agg(F.sum("n_transitions")).collect()[0][0]
    # independent recount: hops whose consecutive tiles differ
    w = Window.partitionBy("traj_id").orderBy("seq")
    tiled = cells.withColumn("_t", cell_parent("cell_id", 8))
    moved = (
        tiled.withColumn("_p", F.lag("_t").over(w))
        .filter(F.col("_p").isNotNull() & (F.col("_p") != F.col("_t")))
        .count()
    )
    assert n_trans == moved, (n_trans, moved)
    t_trans = time.time() - t0

    t0 = time.time()
    od = od_matrix(cells, level=4)
    n_trips = od.agg(F.sum("n_trips")).collect()[0][0]
    assert n_trips == n_trajs, (n_trips, n_trajs)
    t_od = time.time() - t0

    t0 = time.time()
    pr = pagerank_exact(trans, 3, "from_tile", "to_tile", "n_transitions")
    stats = pr.agg(F.sum("pr_e12"), F.count("*")).collect()[0]
    assert stats[0] <= SCALE
    n_nodes = (
        trans.select(F.col("from_tile").alias("n"))
        .unionByName(trans.select(F.col("to_tile").alias("n")))
        .distinct().count()
    )
    assert stats[1] == n_nodes
    t_pr = time.time() - t0

    ts.unpersist(); trans.unpersist(); cells.unpersist()
    print(f"n_fixes={n} trajs={n_trajs} hops={total_hops} "
          f"transitions={n_trans} pr_nodes={stats[1]}")
    print(f"stats={t_stats:.1f}s transitions={t_trans:.1f}s "
          f"od={t_od:.1f}s pagerank={t_pr:.1f}s  ALL INVARIANTS EXACT")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )
