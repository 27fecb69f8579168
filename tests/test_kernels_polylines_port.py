"""S2Polyline golden parity mirrored from
/root/reference/tests/test_s2polyline_port.rs."""

import math

import numpy as np

from s2_geometry_rust_spark.kernels import polylines as pk


def _chain(*coords):
    v = np.array(coords, np.float64)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_polyline_length():
    quarter = _chain((1, 0, 0), (0, 1, 0))
    assert abs(pk.length(quarter) - math.pi / 2) < 1e-10
    large = _chain((1, 0, 0), (-0.5, 0.866, 0.0))
    assert pk.length(large) > math.pi * 0.6
    assert pk.length(np.empty((0, 3))) == 0.0
    assert pk.length(_chain((1, 0, 0))) == 0.0


def test_polyline_interpolation():
    line = _chain((1, 0, 0), (0, 1, 0), (0, 0, 1))
    start = pk.interpolate(line, 0.0)
    end = pk.interpolate(line, 1.0)
    assert np.linalg.norm(start - np.array([1.0, 0, 0])) < 1e-10
    assert np.linalg.norm(end - np.array([0, 0, 1.0])) < 1e-10
    # beyond bounds clamps
    assert np.linalg.norm(pk.interpolate(line, -0.5) - start) < 1e-10
    assert np.linalg.norm(pk.interpolate(line, 1.5) - end) < 1e-10
    # interpolated points stay on the unit sphere
    for f in (0.1, 0.25, 0.33, 0.5, 0.67, 0.75, 0.9):
        p = pk.interpolate(line, f)
        assert abs(np.linalg.norm(p) - 1.0) < 1e-10
    # accumulated-length semantics: fraction 0.5 of a symmetric 2-edge
    # chain lands on the middle vertex
    mid = pk.interpolate(line, 0.5)
    assert np.linalg.norm(mid - np.array([0.0, 1.0, 0.0])) < 1e-10


def test_polyline_projection():
    line = _chain((1, 0, 0), (0, 1, 0), (0, 0, 1))
    q = np.array([0.5, 0.5, 0.5])
    q /= np.linalg.norm(q)
    closest, nxt = pk.project(line, q)
    assert abs(np.linalg.norm(closest) - 1.0) < 1e-10
    assert nxt < len(line)
    # point on the middle of the first edge projects onto it.  NOTE:
    # the reference's project_to_edge treats the tangent parameter t as
    # an arc fraction (polyline.rs:469-490), so the returned point is
    # NOT the true geodesic projection — its own test asserts only
    # next_vertex and normalization, mirrored here.
    m = (line[0] + line[1]) / 2
    m /= np.linalg.norm(m)
    closest, nxt = pk.project(line, m)
    assert nxt == 1
    assert abs(np.linalg.norm(closest) - 1.0) < 1e-10


def test_polyline_intersections():
    p1 = _chain((1, 0, 0), (0, 1, 0))
    n1 = _chain((1, 0, 0), (0.9, 0.1, 0.0))
    n2 = _chain((0, 0, 1), (0.0, 0.1, 0.9))
    assert not pk.intersects(n1, n2)
    # crossing pair under predicates::crossing_sign semantics (the
    # polyline path's edge_or_vertex_crossing reduces to
    # crossing_sign > 0 because that crossing_sign never returns 0 —
    # polyline.rs:502-504 + predicates.rs:666-682): equator arc x
    # meridian arc through their common midpoint
    def latlng(lat, lng):
        la, lo = math.radians(lat), math.radians(lng)
        return (
            math.cos(la) * math.cos(lo),
            math.cos(la) * math.sin(lo),
            math.sin(la),
        )

    eq = _chain(latlng(0, -10), latlng(0, 10))
    mer = _chain(latlng(-10, 0), latlng(10, 0))
    assert pk.intersects(eq, mer)
