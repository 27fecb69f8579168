"""Soak the region-containment / loop-intersection joins at scale:
8k random caps (A) x 40k random small triangle loops (B) — forces the
fully-distributed covering path (>5k regions), then spot-verifies
result pairs and non-pairs against the scalar kernels.

Run: python tools/containment_soak.py [n_caps] [n_loops]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s2_geometry_rust_spark.fixtures import REGIONS_SCHEMA  # noqa: E402
from s2_geometry_rust_spark.operators.spatial_join import (  # noqa: E402
    region_containment_join,
)
from s2_geometry_rust_spark.session import get_spark  # noqa: E402


def main(n_caps: int = 8000, n_loops: int = 40000, seed: int = 7) -> int:
    spark = get_spark("containment-soak", cpus=16)
    rng = np.random.default_rng(seed)

    cap_lat = rng.uniform(-75, 75, n_caps)
    cap_lng = rng.uniform(-180, 180, n_caps)
    cap_r = rng.uniform(0.5, 6.0, n_caps)
    a_rows = [
        (f"cap-{i:06d}", "cap", float(cap_lat[i]), float(cap_lng[i]),
         float(cap_r[i]), None, None, None, None)
        for i in range(n_caps)
    ]
    a = spark.createDataFrame(a_rows, REGIONS_SCHEMA).repartition(32)

    c_lat = rng.uniform(-80, 80, n_loops)
    c_lng = rng.uniform(-179, 179, n_loops)
    sz = rng.uniform(0.05, 0.4, n_loops)
    b_rows = []
    for i in range(n_loops):
        la, ln, s = float(c_lat[i]), float(c_lng[i]), float(sz[i])
        b_rows.append(
            (f"loop-{i:06d}", "loop", None, None, None, None,
             [(la - s, ln - s), (la - s, ln + s), (la + s, ln)], None,
             None)
        )
    b = spark.createDataFrame(b_rows, REGIONS_SCHEMA).repartition(32)

    t0 = time.time()
    out = region_containment_join(a, b).collect()
    dt = time.time() - t0
    pairs = {(r["a_id"], r["b_id"]) for r in out}
    print(f"pairs: {len(pairs)}  wall: {dt:.1f}s  "
          f"({n_caps} caps x {n_loops} loops)")

    # spot verification against the scalar kernels
    from s2_geometry_rust_spark.kernels import latlng as lk
    from s2_geometry_rust_spark.kernels.caps import S2Cap

    def cap_of(i: int) -> S2Cap:
        lat_r = float(lk.degrees_to_radians(cap_lat[i]))
        lng_r = float(lk.degrees_to_radians(cap_lng[i]))
        x, y, z = lk.latlng_to_xyz(np.float64(lat_r), np.float64(lng_r))
        return S2Cap.from_center_degrees(
            (float(x), float(y), float(z)), float(cap_r[i])
        )

    def loop_verts(j: int) -> np.ndarray:
        la, ln, s = float(c_lat[j]), float(c_lng[j]), float(sz[j])
        pts = [(la - s, ln - s), (la - s, ln + s), (la + s, ln)]
        lat = lk.degrees_to_radians(np.array([p[0] for p in pts], np.float64))
        lng = lk.degrees_to_radians(np.array([p[1] for p in pts], np.float64))
        x, y, z = lk.latlng_to_xyz(lat, lng)
        return np.stack([x, y, z], axis=-1)

    def kernel_contains(i: int, j: int) -> bool:
        v = loop_verts(j)
        return bool(np.all(cap_of(i).contains_points_batch(
            v[:, 0], v[:, 1], v[:, 2])))

    mism = 0
    sample = rng.choice(len(out), size=min(300, len(out)), replace=False)
    for k in sample:
        r = out[int(k)]
        i = int(r["a_id"].split("-")[1])
        j = int(r["b_id"].split("-")[1])
        if not kernel_contains(i, j):
            mism += 1
    # random non-pairs (overwhelmingly true negatives)
    neg_checked = neg_bad = 0
    while neg_checked < 300:
        i = int(rng.integers(0, n_caps))
        j = int(rng.integers(0, n_loops))
        if (f"cap-{i:06d}", f"loop-{j:06d}") in pairs:
            continue
        if kernel_contains(i, j):
            neg_bad += 1
        neg_checked += 1
    print(f"spot-check: {len(sample)} positives ({mism} wrong), "
          f"{neg_checked} negatives ({neg_bad} missed)")
    spark.stop()
    return 0 if (mism == 0 and neg_bad == 0) else 1


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    raise SystemExit(main(*args))
