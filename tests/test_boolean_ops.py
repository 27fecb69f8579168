"""Cell-union boolean ops: sound outer approximation of A op B against
the winding-PIP ground truth, exercised on the reference's own
a/b boolean fixture loops (tests/test_s2loop_port.rs loop_a/loop_b and
the a_union_b / a_intersect_b result fixtures)."""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_rust_spark import fixtures
from s2_geometry_rust_spark.kernels import latlng as lk
from s2_geometry_rust_spark.kernels.loops import S2Loop
from s2_geometry_rust_spark.operators.boolean_ops import (
    contains_points,
    loop_boolean_cells,
)


def _sample_points(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=1)[:, None]
    return p[:, 0], p[:, 1], p[:, 2]


def _pairs_df(spark):
    def verts(name):
        return [(float(a), float(b)) for a, b in fixtures.LOOPS[name]]

    return spark.createDataFrame(
        [(0, verts("loop_a"), verts("loop_b"))],
        "pair_id long, "
        "a_vertices array<struct<lat:double,lng:double>>, "
        "b_vertices array<struct<lat:double,lng:double>>",
    )


@pytest.mark.parametrize("op,combine", [
    ("union", lambda a, b: a | b),
    ("intersection", lambda a, b: a & b),
    ("difference", lambda a, b: a & ~b),
])
def test_boolean_cells_sound_outer_approx(spark, op, combine):
    pairs = _pairs_df(spark)
    out = loop_boolean_cells(pairs, op, max_cells=256).toPandas()
    cells = out["cell_id"].to_numpy(np.int64).view(np.uint64)
    assert len(cells) > 0

    la = S2Loop.from_degrees(fixtures.LOOPS["loop_a"])
    lb = S2Loop.from_degrees(fixtures.LOOPS["loop_b"])
    x, y, z = _sample_points()
    # concentrate extra samples near the loops (around lng 180, lat 0)
    rng = np.random.default_rng(7)
    lat = rng.uniform(-2.0, 2.0, size=3000)
    lng = np.where(rng.random(3000) < 0.5,
                   rng.uniform(177.0, 180.0, 3000),
                   rng.uniform(-180.0, -177.0, 3000))
    xx, yy, zz = lk.latlng_to_xyz(lk.degrees_to_radians(lat),
                                  lk.degrees_to_radians(lng))
    x = np.concatenate([x, xx]); y = np.concatenate([y, yy])
    z = np.concatenate([z, zz])

    in_a = la.contains_points_batch(x, y, z)
    in_b = lb.contains_points_batch(x, y, z)
    truth = combine(in_a, in_b)
    approx = contains_points(cells, x, y, z)
    # soundness: no true point may fall outside the approximation
    missed = truth & ~approx
    assert not missed.any(), int(missed.sum())
    # usefulness: the outer approximation is not the whole sphere
    if truth.any():
        precision = float((truth & approx).sum()) / float(approx.sum())
        assert precision > 0.1, precision


def test_boolean_union_covers_fixture_result_loop(spark):
    """The reference's own a_union_b fixture loop: every point of it
    must be inside the union approximation of loop_a | loop_b."""
    pairs = _pairs_df(spark)
    out = loop_boolean_cells(pairs, "union", max_cells=256).toPandas()
    cells = out["cell_id"].to_numpy(np.int64).view(np.uint64)

    lu = S2Loop.from_degrees(fixtures.LOOPS["a_union_b"])
    rng = np.random.default_rng(11)
    lat = rng.uniform(-2.0, 2.0, size=4000)
    lng = np.where(rng.random(4000) < 0.5,
                   rng.uniform(176.0, 180.0, 4000),
                   rng.uniform(-180.0, -176.0, 4000))
    x, y, z = lk.latlng_to_xyz(lk.degrees_to_radians(lat),
                               lk.degrees_to_radians(lng))
    inside = lu.contains_points_batch(x, y, z)
    approx = contains_points(cells, x, y, z)
    missed = inside & ~approx
    assert not missed.any(), int(missed.sum())
