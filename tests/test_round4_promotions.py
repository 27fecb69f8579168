"""Round-4 promotions of T-only kernels into driver-checkable
operators: cap add_point running bound, maximum_tile, and
canonicalize_covering — each engine path parity-tested against its
numpy kernel here (the contract queries add the independent DuckDB
oracles on top)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels.caps import S2Cap
from s2_geometry_rust_spark.kernels.coverer import (
    CovererOptions,
    S2RegionCoverer,
)


def _rand_cells(rng, n):
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    leaf = ck.from_point(pts[:, 0], pts[:, 1], pts[:, 2]).astype(np.uint64)
    lv = rng.integers(0, 31, size=n)
    return ck.parent_at_level(leaf, lv)


# ---------------------------------------------------------------------------
# cap add_point running bound
# ---------------------------------------------------------------------------


def test_cap_add_point_bounds_matches_kernel_fold(spark):
    from s2_geometry_rust_spark.operators.geom_aggs import (
        cap_add_point_bounds,
    )

    rng = np.random.default_rng(44)
    n = 400
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    pdf = pd.DataFrame({
        "point_id": np.arange(n),
        "group_id": np.arange(n) % 7,
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
    })
    got = (
        cap_add_point_bounds(spark.createDataFrame(pdf).repartition(5))
        .toPandas().set_index("group_id").sort_index()
    )
    for g in range(7):
        rows = pdf[pdf.group_id == g].sort_values("point_id")
        cap = S2Cap.from_point(rows.iloc[0][["x", "y", "z"]].to_numpy())
        for _, r in rows.iloc[1:].iterrows():
            cap.add_point(r.x, r.y, r.z)
        assert got.loc[g, "center_id"] == rows.point_id.iloc[0]
        assert got.loc[g, "n_points"] == len(rows)
        assert got.loc[g, "radius_l2"] == cap.radius_l2, g  # bit-exact


# ---------------------------------------------------------------------------
# maximum_tile
# ---------------------------------------------------------------------------


def test_cell_maximum_tile_matches_kernel(spark):
    from s2_geometry_rust_spark.functions import cell_maximum_tile

    rng = np.random.default_rng(45)
    n = 3000
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    leaf = ck.from_point(pts[:, 0], pts[:, 1], pts[:, 2]).astype(np.uint64)
    # unaligned ends around a coarser ancestor's range_min, including
    # ends BELOW the start (the unchecked-fallback branch)
    lv2 = rng.integers(3, 16, size=n)
    anchor = ck.parent_at_level(leaf, lv2)
    k = (rng.integers(0, 10**6, size=n).astype(np.uint64) * np.uint64(2))
    end = ck.range_min(anchor) + k
    want = np.array(
        [ck.maximum_tile(int(leaf[i]), int(end[i])) for i in range(n)],
        dtype=np.uint64,
    )
    pdf = pd.DataFrame({
        "i": np.arange(n),
        "leaf": leaf.view(np.int64),
        "end": end.view(np.int64),
    })
    import pyspark.sql.functions as F

    got = (
        spark.createDataFrame(pdf).repartition(6)
        .select("i", cell_maximum_tile("leaf", "end").alias("tile"))
        .toPandas().sort_values("i")
    )
    np.testing.assert_array_equal(
        got["tile"].to_numpy(np.int64).view(np.uint64), want
    )


# ---------------------------------------------------------------------------
# canonicalize_covering
# ---------------------------------------------------------------------------


def test_canonicalize_covering_matches_kernel(spark):
    from s2_geometry_rust_spark.operators.unions_ops import (
        canonicalize_covering_distributed,
    )

    rng = np.random.default_rng(46)
    groups = {g: _rand_cells(rng, int(rng.integers(5, 120)))
              for g in range(6)}
    rows = [(g, int(c)) for g, cells in groups.items()
            for c in np.unique(cells).view(np.int64)]
    df = spark.createDataFrame(rows, "union_id long, cell_id long")
    opts = CovererOptions(max_cells=10, min_level=6, max_level=16,
                          level_mod=2)
    cov = S2RegionCoverer(opts)
    got = canonicalize_covering_distributed(
        df.repartition(4), min_level=6, max_level=16, level_mod=2,
        max_cells=10,
    ).toPandas()
    for g, cells in groups.items():
        want = np.sort(cov.canonicalize_covering(cells))
        have = np.sort(
            got[got.union_id == g].cell_id.to_numpy(np.int64)
            .view(np.uint64)
        )
        np.testing.assert_array_equal(have, want, err_msg=f"union {g}")
