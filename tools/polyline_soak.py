"""10k-polyline intersection-join soak: evidence that the
covering-bucket candidate stage scales (no all-pairs anywhere).

Synthesizes N deterministic short random polylines (seeded numpy,
4 vertices each, ~50-500 km extents), runs
polyline_intersection_join, and reports wall time, candidate-pair and
crossing counts, plus an assertion that the physical plan contains no
CartesianProduct / BroadcastNestedLoopJoin.

Usage: python tools/polyline_soak.py [n_lines] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_lines(spark, n: int, seed: int = 20260817):
    rng = np.random.default_rng(seed)
    # cluster line origins so some tiles are hot (skew-realistic)
    n_hubs = max(16, n // 250)
    hubs_lat = rng.uniform(-60, 60, n_hubs)
    hubs_lng = rng.uniform(-180, 180, n_hubs)
    hub = rng.integers(0, n_hubs, n)
    lat0 = hubs_lat[hub] + rng.normal(0, 4.0, n)
    lng0 = hubs_lng[hub] + rng.normal(0, 4.0, n)
    rows = []
    for i in range(n):
        la, ln = lat0[i], lng0[i]
        verts = [(float(la), float(ln))]
        for _ in range(3):
            la = np.clip(la + rng.normal(0, 0.3), -89.9, 89.9)
            ln = ((ln + rng.normal(0, 0.3) + 180) % 360) - 180
            verts.append((float(la), float(ln)))
        rows.append((f"L{i:06d}", [{"lat": a, "lng": b} for a, b in verts]))
    return spark.createDataFrame(
        rows, "line_id string, vertices array<struct<lat double, lng double>>"
    ).repartition(64)


def main(n: int = 10_000, cpus: int = 16) -> None:
    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.operators.polyline_join import (
        polyline_intersection_join,
    )

    spark = get_spark("polyline-soak", cpus=cpus)
    lines = synth_lines(spark, n)
    lines.persist().count()
    t0 = time.time()
    out = polyline_intersection_join(lines, lines)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, "all-pairs plan leaked in"
    assert "BroadcastNestedLoopJoin" not in plan, "theta-join plan leaked in"
    crossings = out.filter("a_id < b_id").count()
    dt = time.time() - t0
    print(
        f"lines={n} crossings={crossings} wall={dt:.1f}s "
        f"({n / dt:.0f} lines/s) plan=hash-joins-only"
    )
    spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
