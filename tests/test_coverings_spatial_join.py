"""Covering operator and point-in-region spatial join: parity with the
per-region kernels and exact-containment ground truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2_geometry_rust_spark import fixtures
from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels import latlng as lk
from s2_geometry_rust_spark.kernels.coverer import CovererOptions, S2RegionCoverer
from s2_geometry_rust_spark.kernels import unions as ku
from s2_geometry_rust_spark.operators.coverings import cover_regions, region_from_row
from s2_geometry_rust_spark.operators.spatial_join import (
    point_in_rect_join,
    point_in_region_join,
)
from s2_geometry_rust_spark.sources import extract_geo_points, synth_documents


@pytest.fixture(scope="module")
def regions(spark):
    return fixtures.all_regions(spark)


@pytest.fixture(scope="module")
def points(spark):
    docs = synth_documents(spark, 800, seed=42)
    return extract_geo_points(docs).cache()


def test_cover_regions_matches_kernel_per_region(spark, regions):
    got = cover_regions(regions, max_cells=8).toPandas()
    coverer = S2RegionCoverer(CovererOptions(max_cells=8))
    for row in regions.collect():
        rid = row["region_id"]
        want = coverer.get_covering(region_from_row(row))
        g = got[got.region_id == rid]["cell_id"].to_numpy(np.int64).view(np.uint64)
        np.testing.assert_array_equal(np.sort(g), np.sort(want), err_msg=rid)
        assert len(g) <= 8
        assert ku.is_normalized(np.sort(g))


def test_covering_cells_valid_and_ranges_consistent(spark, regions):
    got = cover_regions(regions, max_cells=12).toPandas()
    ids = got["cell_id"].to_numpy(np.int64).view(np.uint64)
    assert ck.is_valid(ids).all()
    np.testing.assert_array_equal(
        got["cell_min"].to_numpy(np.int64).view(np.uint64), ck.range_min(ids)
    )
    np.testing.assert_array_equal(
        got["cell_max"].to_numpy(np.int64).view(np.uint64), ck.range_max(ids)
    )
    np.testing.assert_array_equal(got["level"].to_numpy(np.int32), ck.level(ids))


def _ground_truth_pairs(points_pdf, region_rows):
    lat_r = lk.degrees_to_radians(points_pdf["lat"].to_numpy())
    lng_r = lk.degrees_to_radians(points_pdf["lng"].to_numpy())
    x, y, z = lk.latlng_to_xyz(lat_r, lng_r)
    pairs = set()
    for row in region_rows:
        reg = region_from_row(row)
        kind = row["kind"]
        if kind == "loop":
            m = reg.loop.contains_points_batch(x, y, z)
        elif kind == "cap":
            m = reg.cap.contains_points_batch(x, y, z)
        else:
            m = reg.rect.contains_latlng_batch(lat_r, lng_r)
        for d in points_pdf["doc_id"].to_numpy()[np.asarray(m, bool)]:
            pairs.add((d, row["region_id"]))
    return pairs


def test_point_in_region_join_matches_exact_containment(spark, regions, points):
    joined = point_in_region_join(points, regions, max_cells=16)
    got = {
        (r["doc_id"], r["region_id"])
        for r in joined.select("doc_id", "region_id").collect()
    }
    want = _ground_truth_pairs(points.toPandas(), regions.collect())
    missed = want - got
    extra = got - want
    # The filter stage may only drop pairs the *reference's own* covering
    # would miss (vertex-sampling may_intersect, SURVEY.md §2.9 TODO);
    # the refine stage must never produce extras.
    assert not extra, f"false positives: {sorted(extra)[:10]}"
    assert not missed, f"false negatives: {sorted(missed)[:10]}"


def test_point_in_rect_join_pure_jvm(spark, points):
    rects = spark.createDataFrame(
        [
            ("band", -5.0, 5.0, -30.0, 30.0),
            ("wrap", -10.0, 10.0, 170.0, -170.0),
        ],
        "region_id string, lat_lo double, lat_hi double, lng_lo double, lng_hi double",
    )
    got = point_in_rect_join(points.select("doc_id", "lat", "lng"), rects)
    pdf = got.toPandas()
    for _, r in pdf.iterrows():
        assert r.lat_lo <= r.lat <= r.lat_hi
        if r.region_id == "wrap":
            assert r.lng >= 170.0 or r.lng <= -170.0
        else:
            assert -30.0 <= r.lng <= 30.0
    # count parity vs pandas
    p = points.toPandas()
    want = ((p.lat.between(-5, 5)) & (p.lng.between(-30, 30))).sum() + (
        (p.lat.between(-10, 10)) & ((p.lng >= 170) | (p.lng <= -170))
    ).sum()
    assert len(pdf) == want


def test_exact_fallback_rate_under_one_percent(spark, regions, points):
    from s2_geometry_rust_spark.operators.spatial_join import last_fallback_rate

    point_in_region_join(points, regions, max_cells=32).count()
    rate = last_fallback_rate()
    # BASELINE sanity target (src/lib.rs:18-20 tier claims): < 1% of
    # predicate evaluations take the exact-arithmetic path
    assert rate is not None and rate < 0.01, rate


def test_point_in_region_join_distributed_path_matches(spark, regions, points):
    """The distributed path (no driver-side region collect) must produce
    exactly the ground-truth pairs on the fixture regions."""
    joined = point_in_region_join(points, regions, max_cells=16,
                                  distributed=True)
    got = {
        (r["doc_id"], r["region_id"])
        for r in joined.select("doc_id", "region_id").collect()
    }
    want = _ground_truth_pairs(points.toPandas(), regions.collect())
    assert got == want


def test_point_in_region_join_auto_distributed_large_regions(spark, points):
    """Synthetic large cap table: distributed=None auto-switches past the
    threshold; result must equal exact containment."""
    import s2_geometry_rust_spark.operators.spatial_join as sj

    rng = np.random.default_rng(5)
    n = 500
    rows = []
    for i in range(n):
        lat = float(rng.uniform(-80, 80))
        lng = float(rng.uniform(-180, 180))
        rad = float(rng.uniform(0.5, 6.0))
        rows.append((f"cap{i:05d}", "cap", lat, lng, rad, None, None, None,
                     None))
    regions = spark.createDataFrame(rows, fixtures.REGIONS_SCHEMA)
    old = sj.DISTRIBUTED_REGION_THRESHOLD
    sj.DISTRIBUTED_REGION_THRESHOLD = 100  # force the auto switch
    try:
        joined = point_in_region_join(points, regions, max_cells=8)
        got = {
            (r["doc_id"], r["region_id"])
            for r in joined.select("doc_id", "region_id").collect()
        }
    finally:
        sj.DISTRIBUTED_REGION_THRESHOLD = old
    want = _ground_truth_pairs(points.toPandas(), regions.collect())
    assert got == want and len(want) > 50


def test_cap_coverings_batch_matches_per_cap():
    """Batched cap coverer == per-cap conservative_covering bit-for-bit
    (admit and containment formulas are shared; only loop batching
    differs), across radii from 0.01 deg to full, plus empty/full."""
    import numpy as np

    from s2_geometry_rust_spark.kernels import latlng as lk
    from s2_geometry_rust_spark.kernels.caps import S2Cap
    from s2_geometry_rust_spark.operators.coverings import (
        TrueCapRegion,
        cap_coverings_batch,
        conservative_covering,
    )

    rng = np.random.default_rng(5)
    caps = []
    for _ in range(80):
        lat, lng = rng.uniform(-85, 85), rng.uniform(-180, 180)
        x, y, z = lk.latlng_to_xyz(np.radians(lat), np.radians(lng))
        r = float(rng.choice([0.01, 0.1, 1.0, 5.0, 30.0, 91.0, 179.0]))
        caps.append(S2Cap.from_center_degrees((float(x), float(y), float(z)), r))
    caps.append(S2Cap.empty())
    caps.append(S2Cap.full())
    for budget in (8, 64):
        ref = [
            conservative_covering(TrueCapRegion(c), max_cells=budget)
            for c in caps
        ]
        got = cap_coverings_batch(caps, max_cells=budget)
        for i, (r, g) in enumerate(zip(ref, got)):
            assert np.array_equal(np.sort(r), np.sort(g)), (budget, i)


def test_point_in_region_distributed_salted_matches_unsalted(spark, regions, points):
    """Explicit hot-cell salting is a pure repartitioning: the salted
    distributed join must emit exactly the unsalted pair set (the soak
    tools/pip_skew_soak.py measures the skew histogram at 2M points)."""
    from s2_geometry_rust_spark.operators.spatial_join import (
        point_in_region_join_distributed,
    )

    plain = point_in_region_join_distributed(points, regions, max_cells=16)
    salted = point_in_region_join_distributed(
        points, regions, max_cells=16, n_salts=8
    )
    a = {(r["doc_id"], r["region_id"])
         for r in plain.select("doc_id", "region_id").collect()}
    b = {(r["doc_id"], r["region_id"])
         for r in salted.select("doc_id", "region_id").collect()}
    assert a == b and len(a) > 0
