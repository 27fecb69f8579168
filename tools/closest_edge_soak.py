"""Closest-edge indexed-path soak: the covering-pruned join at a scale
where the brute cross join is prohibitive, verified exactly against
brute on a point subsample.

n points x m edges: brute is n*m scored pairs; the indexed path scores
only candidates inside each edge's (cap + search radius) covering.
With edges spread uniformly, a small search radius keeps the candidate
fan-in near the true-neighbor density, and the provable-optimality
cut (best <= chord2(radius)) sends only edge-desert points to the
brute fallback.

Usage: python tools/closest_edge_soak.py [n_points] [n_edges] [cpus]
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_points(spark, n: int, partitions: int = 64):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            rng = np.random.default_rng(int(ids[0]) + 17)
            v = rng.normal(size=(len(ids), 3))
            yield pd.DataFrame(
                {"point_id": ids, "x": v[:, 0], "y": v[:, 1], "z": v[:, 2]}
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "point_id long, x double, y double, z double"
    )


def synth_edges(spark, m: int):
    rng = np.random.default_rng(29)
    a = rng.normal(size=(m, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    # short edges: endpoint b = a nudged ~1 degree, renormalized
    b = a + rng.normal(size=(m, 3)) * 0.02
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    rows = [
        (i, float(a[i, 0]), float(a[i, 1]), float(a[i, 2]),
         float(b[i, 0]), float(b[i, 1]), float(b[i, 2]))
        for i in range(m)
    ]
    return spark.createDataFrame(
        rows,
        "edge_id long, ax double, ay double, az double,"
        " bx double, by double, bz double",
    )


def main(n: int = 200_000, m: int = 5_000, cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.closest_edge import (
        closest_edge_join, closest_edge_join_indexed)
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("closest-edge-soak", cpus=cpus)
    pts = synth_points(spark, n)
    pts.persist().count()
    edges = synth_edges(spark, m)
    edges.persist().count()

    t0 = time.time()
    idx = closest_edge_join_indexed(pts, edges, search_radius_deg=6.0)
    idx.persist()
    n_out = idx.count()
    dt_idx = time.time() - t0
    print(f"indexed: n={n} m={m} out={n_out} wall={dt_idx:.1f}s "
          f"points/s={n / dt_idx:,.0f}")
    assert n_out == n

    # exactness: brute on a 2k-point subsample must agree row-for-row
    sample = pts.filter(F.col("point_id") % (n // 2_000) == 0)
    t0 = time.time()
    brute = closest_edge_join(sample, edges)
    bmap = {r["point_id"]: (r["edge_id"], r["d2_nano"])
            for r in brute.collect()}
    dt_brute = time.time() - t0
    imap = {r["point_id"]: (r["edge_id"], r["d2_nano"])
            for r in idx.join(sample.select("point_id"), "point_id")
            .collect()}
    assert imap == bmap, "indexed path must equal brute exactly"
    est_full_brute = dt_brute * (n / max(len(bmap), 1))
    print(f"subsample brute: {len(bmap)} pts in {dt_brute:.1f}s "
          f"(extrapolated full brute ~{est_full_brute:,.0f}s)")
    print("indexed == brute on subsample: exact")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 5_000,
        int(sys.argv[3]) if len(sys.argv) > 3 else 16,
    )
