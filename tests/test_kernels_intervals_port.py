"""S1Interval golden parity mirrored from
/root/reference/tests/test_s1interval_port.rs (family-1 behavioral
suite): constructors, predicates, center/length, complement, contains,
interval ops, add_point, project, from_point_pair, expanded."""

import math

import numpy as np
import pytest

from s2_geometry_rust_spark.kernels.intervals import S1Interval

PI = math.pi
PI_2 = math.pi / 2
EPS = np.finfo(np.float64).eps


class Base:
    """S1IntervalTestBase fixtures (test_s1interval_port.rs:20-100)."""

    def __init__(self):
        self.empty = S1Interval.empty()
        self.full = S1Interval.full()
        self.zero = S1Interval.from_point(0.0)
        self.pi2 = S1Interval.from_point(PI_2)
        self.pi = S1Interval.from_point(PI)
        self.mipi = S1Interval.from_point(-PI)
        self.quad1 = S1Interval.new(0.0, PI_2)
        self.quad2 = S1Interval.new(PI_2, -PI)
        self.quad3 = S1Interval.new(PI, -PI_2)
        self.quad4 = S1Interval.new(-PI_2, 0.0)
        self.quad12 = S1Interval.new(0.0, -PI)
        self.quad23 = S1Interval.new(PI_2, -PI_2)  # inverted
        self.quad34 = S1Interval.new(-PI, 0.0)
        self.quad123 = S1Interval.new(0.0, -PI_2)


@pytest.fixture(scope="module")
def base():
    return Base()


def test_constructors_and_accessors(base):
    assert base.quad12.lo == 0.0 and base.quad12.hi == PI
    assert base.quad34.lo == PI and base.quad34.hi == 0.0
    assert base.pi.lo == PI and base.pi.hi == PI
    # [-pi, -pi] normalizes to [pi, pi]
    assert base.mipi.lo == PI and base.mipi.hi == PI
    assert base.quad23.lo == PI_2 and base.quad23.hi == -PI_2


def test_simple_predicates(base):
    assert not base.zero.is_empty() and not base.zero.is_full()
    assert base.empty.is_empty() and not base.empty.is_full()
    assert base.empty.is_inverted()
    assert base.full.is_full() and not base.full.is_empty()
    assert not base.quad12.is_empty() and not base.quad12.is_full()
    assert not base.quad12.is_inverted()
    assert base.quad23.is_inverted() and not base.quad23.is_empty()
    assert not base.pi.is_empty() and not base.pi.is_inverted()
    assert not base.mipi.is_empty() and not base.mipi.is_inverted()


def test_almost_empty_or_full():
    k_almost_pi = PI - 2.0 * EPS
    assert not S1Interval.new(-k_almost_pi, PI).is_full()
    assert not S1Interval.new(-PI, k_almost_pi).is_full()
    assert not S1Interval.new(PI, -k_almost_pi).is_empty()
    assert not S1Interval.new(k_almost_pi, -PI).is_empty()


def test_get_center(base):
    assert base.quad12.get_center() == PI_2
    assert abs(S1Interval.new(3.1, 2.9).get_center() - (3.0 - PI)) < 1e-15
    assert abs(S1Interval.new(-2.9, -3.1).get_center() - (PI - 3.0)) < 1e-15
    assert abs(S1Interval.new(2.1, -2.1).get_center() - PI) < 1e-15
    assert base.pi.get_center() == PI
    assert base.mipi.get_center() == PI
    assert abs(base.quad23.get_center()) == PI
    assert abs(base.quad123.get_center() - 0.75 * PI) < 1e-15


def test_get_length(base):
    assert base.quad12.get_length() == PI
    assert base.pi.get_length() == 0.0
    assert base.mipi.get_length() == 0.0
    assert abs(base.quad123.get_length() - 1.5 * PI) < 1e-15
    assert abs(base.quad23.get_length()) == PI
    assert base.full.get_length() == 2.0 * PI
    assert base.empty.get_length() < 0.0


def test_complement(base):
    assert base.empty.complement().is_full()
    assert base.full.complement().is_empty()
    assert base.pi.complement().is_full()
    assert base.mipi.complement().is_full()
    assert base.zero.complement().is_full()
    assert base.quad12.complement().approx_equals(base.quad34, 1e-15)
    assert base.quad34.complement().approx_equals(base.quad12, 1e-15)
    assert base.quad123.complement().approx_equals(base.quad4, 1e-15)


def test_contains_points(base):
    e, f, q12, q23 = base.empty, base.full, base.quad12, base.quad23
    assert not e.contains_point(0.0) and not e.contains_point(PI)
    assert not e.contains_point(-PI)
    assert f.contains_point(0.0) and f.contains_point(PI) and f.contains_point(-PI)
    assert f.interior_contains_point(PI) and f.interior_contains_point(-PI)
    assert q12.contains_point(0.0) and q12.contains_point(PI)
    assert q12.contains_point(-PI)
    assert q12.interior_contains_point(PI_2)
    assert not q12.interior_contains_point(0.0)
    assert not q12.interior_contains_point(PI)
    assert q23.contains_point(PI_2) and q23.contains_point(-PI_2)
    assert q23.contains_point(PI) and q23.contains_point(-PI)
    assert not q23.contains_point(0.0)
    assert not q23.interior_contains_point(PI_2)
    assert q23.interior_contains_point(PI) and q23.interior_contains_point(-PI)
    assert base.pi.contains_point(PI) and base.pi.contains_point(-PI)
    assert not base.pi.contains_point(0.0)
    assert not base.pi.interior_contains_point(PI)
    assert base.zero.contains_point(0.0)
    assert not base.zero.interior_contains_point(0.0)


def test_interval_ops_spot_checks(base):
    # quad12 x quad23 (test_s1interval_port.rs:267+ spot cases)
    assert base.quad12.intersects(base.quad23)
    assert not base.quad12.contains(base.quad23)
    u = base.quad1.union(base.quad2)
    assert u.approx_equals(base.quad12, 1e-15)
    i = base.quad12.intersection(base.quad23)
    assert i.contains_point(PI_2) or i.contains_point(PI)
    assert base.empty.union(base.quad1).approx_equals(base.quad1, 1e-15)
    assert base.quad1.union(base.empty).approx_equals(base.quad1, 1e-15)
    assert base.full.intersection(base.quad1).approx_equals(base.quad1, 1e-15)
    assert base.empty.intersection(base.quad1).is_empty()


def test_add_point():
    r = S1Interval.empty()
    r.add_point(0.0)
    assert r.lo == 0.0 and r.hi == 0.0
    r.add_point(PI_2)
    assert r.lo == 0.0 and r.hi == PI_2
    r.add_point(-PI_2)
    assert r.lo == -PI_2 and r.hi == PI_2


def test_project(base):
    r = S1Interval.new(-PI, -PI)
    assert r.project(-PI) == PI
    assert r.project(0.0) == PI
    r = S1Interval.new(0.0, PI)
    assert r.project(0.1) == 0.1
    assert r.project(-PI_2 + 1e-15) == 0.0
    assert r.project(-PI_2 - 1e-15) == PI


def test_from_point_pair():
    assert S1Interval.from_point_pair(-PI, PI).lo == PI
    assert S1Interval.from_point_pair(PI, -PI).lo == PI
    v = S1Interval.from_point_pair(-3.0, -3.0)
    assert v.lo == -3.0 and v.hi == -3.0
    v = S1Interval.from_point_pair(0.0, PI_2)
    assert v.lo == 0.0 and v.hi == PI_2


def test_expanded(base):
    assert base.empty.expanded(1.0).is_empty()
    assert base.full.expanded(1.0).is_full()
    e = S1Interval.from_point(0.0).expanded(PI_2)
    assert e.approx_equals(S1Interval.new(-PI_2, PI_2), 1e-15)
    assert S1Interval.from_point(PI).expanded(0.01).approx_equals(
        S1Interval.new(PI - 0.01, -PI + 0.01), 1e-15
    )
