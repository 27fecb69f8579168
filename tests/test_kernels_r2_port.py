"""R2Point/R2Rect golden parity mirrored from
/root/reference/tests/test_r2rect_port.rs."""

from s2_geometry_rust_spark.kernels.intervals import R1Interval
from s2_geometry_rust_spark.kernels.r2 import R2Point, R2Rect


def test_empty_rectangles():
    empty = R2Rect.empty()
    assert empty.is_valid()
    assert empty.is_empty()


def test_constructors_and_accessors():
    r = R2Rect.from_points(R2Point(0.1, 0.0), R2Point(0.25, 1.0))
    assert r.x.lo == 0.1 and r.x.hi == 0.25
    assert r.y.lo == 0.0 and r.y.hi == 1.0


def test_from_center_size():
    r = R2Rect.from_center_size(R2Point(0.3, 0.5), R2Point(0.2, 0.4))
    want = R2Rect.from_points(R2Point(0.2, 0.3), R2Point(0.4, 0.7))
    assert r.approx_equals(want, 1e-15)
    r2 = R2Rect.from_center_size(R2Point(1.0, 0.1), R2Point(0.0, 2.0))
    want2 = R2Rect.from_points(R2Point(1.0, -0.9), R2Point(1.0, 1.1))
    assert r2.approx_equals(want2, 1e-15)


def test_from_point_pair():
    r = R2Rect.from_point_pair(R2Point(0.25, 1.0), R2Point(0.1, 0.0))
    assert r.x.lo == 0.1 and r.x.hi == 0.25
    assert r.y.lo == 0.0 and r.y.hi == 1.0


def test_simple_predicates():
    sw1 = R2Point(0.0, 0.25)
    ne1 = R2Point(0.5, 0.75)
    r1 = R2Rect.from_points(sw1, ne1)
    assert r1.contains(r1.get_center())
    assert r1.contains(sw1)
    assert not r1.interior_contains(sw1)
    assert r1.contains_rect(r1)
    assert r1.intersects(r1)


def test_vertices_ccw():
    r = R2Rect.from_points(R2Point(0.0, 0.25), R2Point(0.5, 0.75))
    assert r.get_vertex(0) == R2Point(0.0, 0.25)
    assert r.get_vertex(1) == R2Point(0.5, 0.25)
    assert r.get_vertex(2) == R2Point(0.5, 0.75)
    assert r.get_vertex(3) == R2Point(0.0, 0.75)


def test_union_intersection_ops():
    empty = R2Rect.empty()
    r1 = R2Rect.from_points(R2Point(0.0, 0.0), R2Point(0.5, 0.5))
    r2 = R2Rect.from_points(R2Point(0.25, 0.25), R2Point(1.0, 1.0))
    u = r1.union(r2)
    i = r1.intersection(r2)
    assert u.approx_equals(
        R2Rect.from_points(R2Point(0.0, 0.0), R2Point(1.0, 1.0)), 1e-15
    )
    assert i.approx_equals(
        R2Rect.from_points(R2Point(0.25, 0.25), R2Point(0.5, 0.5)), 1e-15
    )
    assert r1.union(empty).approx_equals(r1, 1e-15)
    assert r1.intersection(empty).is_empty()
    disjoint = R2Rect.from_points(R2Point(0.7, 0.7), R2Point(0.8, 0.8))
    assert not r1.intersects(disjoint)
    assert r1.intersection(disjoint).is_empty()


def test_add_point_and_project():
    r = R2Rect.empty()
    r.add_point(R2Point(0.0, 0.25))
    r.add_point(R2Point(0.5, 0.75))
    assert r.contains(R2Point(0.25, 0.5))
    assert r.project(R2Point(-1.0, 0.5)) == R2Point(0.0, 0.5)
    assert r.project(R2Point(0.25, 2.0)) == R2Point(0.25, 0.75)


def test_expanded():
    r = R2Rect.from_points(R2Point(0.2, 0.4), R2Point(0.3, 0.7))
    e = r.expanded(R2Point(0.1, 0.3))
    assert e.approx_equals(
        R2Rect.from_points(R2Point(0.1, 0.1), R2Point(0.4, 1.0)), 1e-15
    )
    # negative margin collapsing to empty
    assert r.expanded(R2Point(-0.1, 0.3)).is_empty()


def test_r2point_ops():
    p = R2Point(3.0, 4.0)
    q = R2Point(1.0, 2.0)
    assert p.dot_prod(q) == 11.0
    assert p.cross_prod(q) == 2.0
    assert p.ortho() == R2Point(-4.0, 3.0)
    assert p.norm() == 5.0
    assert (p - q) == R2Point(2.0, 2.0)
    assert (p + q) == R2Point(4.0, 6.0)
    assert (q * 2.0) == R2Point(2.0, 4.0)
