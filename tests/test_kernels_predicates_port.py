"""Predicates parity mirrored from
/root/reference/tests/test_s2predicates_comprehensive.rs (the goldens
its source can satisfy)."""

import numpy as np

from s2_geometry_rust_spark.kernels import predicates as pred


def _n(x, y, z):
    v = np.array([x, y, z], np.float64)
    return v / np.linalg.norm(v)


def test_sign_basic_orientations():
    a, b, c = _n(1, 0, 0), _n(0, 1, 0), _n(0, 0, 1)
    assert pred.sign_scalar(a, b, c) == 1
    assert pred.sign_scalar(a, c, b) == -1


def test_compare_edge_directions_parallel_quirk():
    # predicates.rs:427-431: nearly-parallel edges -> 0 regardless of
    # same/opposite direction (pinned quirk)
    a0 = np.zeros(3)
    a1 = np.array([1.0, 0.0, 0.0])
    b0 = np.array([0.0, 1.0, 0.0])
    b1 = np.array([1.0, 1.0, 0.0])
    assert pred.compare_edge_directions_scalar(a0, a1, b0, b1) == 0
    # opposite direction also 0
    assert pred.compare_edge_directions_scalar(a0, a1, b1, b0) == 0
    # clearly different directions -> in {-1, 0, 1}
    c1 = np.array([0.0, 10.0, 0.0])
    assert pred.compare_edge_directions_scalar(a0, a1, a0, c1) in (-1, 0, 1)


def test_ordered_ccw_goldens():
    origin = _n(0, 0, 1)
    a, b, c = _n(1, 0, 0), _n(0, 1, 0), _n(-1, 0, 0)
    assert pred.ordered_ccw_scalar(a, b, c, origin)
    assert not pred.ordered_ccw_scalar(c, b, a, origin)


def test_crossing_sign_goldens():
    a, b = _n(1, 0, 0), _n(-1, 0, 0)
    c, d = _n(0, 1, 0), _n(0, -1, 0)
    assert int(pred.crossing_sign_batch(a[None], b[None], c[None], d[None])[0]) in (1, -1)
    e, f = _n(0.9, 0.9, 0), _n(0.8, 0.8, 0)
    assert int(pred.crossing_sign_batch(a[None], b[None], e[None], f[None])[0]) == -1


def test_compare_edge_distance_golden():
    # point at the pole vs the equatorial x-axis edge, r=0.5 -> farther
    x = np.array([0.0, 0.0, 1.0])
    a0 = np.array([-1.0, 0.0, 0.0])
    a1 = np.array([1.0, 0.0, 0.0])
    assert pred.compare_edge_distance_scalar(x, a0, a1, 0.5) == 1


def test_compare_edge_pair_distance_golden():
    a0, a1 = np.zeros(3), np.array([1.0, 0.0, 0.0])
    b0, b1 = np.array([0.0, 2.0, 0.0]), np.array([1.0, 2.0, 0.0])
    assert pred.compare_edge_pair_distance_scalar(a0, a1, b0, b1, 1.0) == 1
    assert pred.compare_edge_pair_distance_scalar(a0, a1, b0, b1, 3.0) == -1


def test_numerical_stability_determinism():
    base = _n(1, 0, 0)
    eps = float(np.finfo(np.float64).eps)
    b = _n(1.0, eps, 0.0)
    c = _n(1.0, 0.0, eps)
    r1 = pred.sign_scalar(base, b, c)
    r2 = pred.sign_scalar(base, b, c)
    assert r1 == r2


def test_anti_symmetry_random():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(60, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for i in range(0, 60, 3):
        a, b, c = v[i], v[i + 1], v[i + 2]
        assert pred.sign_scalar(a, b, c) == -pred.sign_scalar(a, c, b)
