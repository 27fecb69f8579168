"""Soak the polygon-with-holes point-in-region join on the
fully-distributed path: N random shell+hole polygons x M synthesized
geo points, then sampled exactness vs the scalar kernels.

Run: python tools/polygon_soak.py [n_polygons] [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_polygons: int = 6000, n_docs: int = 100000,
         cpus: int = 16, seed: int = 9) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.fixtures import REGIONS_SCHEMA
    from s2_geometry_rust_spark.kernels import latlng as lk
    from s2_geometry_rust_spark.operators.coverings import region_from_row
    from s2_geometry_rust_spark.operators.spatial_join import (
        point_in_region_join,
    )
    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.sources import (
        extract_geo_points,
        synth_documents,
    )

    spark = get_spark("polygon-soak", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(seed)

    # random shell triangles (side ~1-4 deg) each with a concentric
    # hole triangle (~1/3 size); > DISTRIBUTED_REGION_THRESHOLD forces
    # the fully-distributed covering + inline-geometry refine path
    c_lat = rng.uniform(-70, 70, n_polygons)
    c_lng = rng.uniform(-175, 175, n_polygons)
    sz = rng.uniform(1.0, 4.0, n_polygons)
    rows = []
    for i in range(n_polygons):
        la, ln, s = float(c_lat[i]), float(c_lng[i]), float(sz[i])
        shell = [(la - s, ln - s), (la - s, ln + s), (la + s, ln)]
        h = s / 3.0
        hole = [(la - h, ln - h), (la - h, ln + h), (la + h, ln)]
        rows.append(
            (f"poly-{i:06d}", "polygon", None, None, None, None, None,
             None,
             [(0, [(float(a), float(b)) for a, b in shell]),
              (0, [(float(a), float(b)) for a, b in hole])])
        )
    regions = spark.createDataFrame(rows, REGIONS_SCHEMA).repartition(32)

    docs = synth_documents(spark, n_docs, seed=seed, partitions=cpus * 4)
    pts = extract_geo_points(docs)

    t0 = time.time()
    out = point_in_region_join(pts, regions, max_cells=64).select(
        "doc_id", "lat", "lng", "region_id"
    )
    matched = out.collect()
    dt = time.time() - t0
    pairs = {(r["doc_id"], r["region_id"]) for r in matched}

    # sampled exactness: 300 matched pairs re-checked with the scalar
    # kernel, plus 300 random (point, polygon) non-pairs
    region_rows = {r["region_id"]: r.asDict() for r in regions.collect()}
    pts_pdf = pts.select("doc_id", "lat", "lng").toPandas()
    lat_r = lk.degrees_to_radians(pts_pdf["lat"].to_numpy(np.float64))
    lng_r = lk.degrees_to_radians(pts_pdf["lng"].to_numpy(np.float64))
    px, py, pz = lk.latlng_to_xyz(lat_r, lng_r)
    pos = {d: i for i, d in enumerate(pts_pdf["doc_id"])}

    adapters: dict[str, object] = {}

    def contains(rid: str, doc: str) -> bool:
        if rid not in adapters:
            adapters[rid] = region_from_row(region_rows[rid])
        i = pos[doc]
        return bool(adapters[rid].contains_points_batch(
            px[i:i + 1], py[i:i + 1], pz[i:i + 1])[0])

    sample = list(pairs)[:300]
    for doc, rid in sample:
        assert contains(rid, doc), (doc, rid)
    neg_checked = 0
    docs_list = list(pos)
    rids = list(region_rows)
    while neg_checked < 300:
        doc = docs_list[int(rng.integers(len(docs_list)))]
        rid = rids[int(rng.integers(len(rids)))]
        if (doc, rid) in pairs:
            continue
        assert not contains(rid, doc), (doc, rid)
        neg_checked += 1

    print({
        "n_polygons": n_polygons, "n_docs": n_docs,
        "matched_pairs": len(pairs), "wall_sec": round(dt, 1),
        "sampled_pos": len(sample), "sampled_neg": neg_checked,
    })
    spark.stop()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
