"""R1Interval golden parity mirrored from
/root/reference/tests/test_r1interval_port.rs (incl. the TestIntervalOps
truth-table helper)."""

import pytest

from s2_geometry_rust_spark.kernels.intervals import R1Interval


def _ops(x: R1Interval, y: R1Interval, expected: str):
    assert (expected[0] == "T") == x.contains_interval(y)
    assert (expected[1] == "T") == x.interior_contains_interval(y)
    assert (expected[2] == "T") == x.intersects(y)
    assert (expected[3] == "T") == x.interior_intersects(y)
    # contains <=> union == x ; intersects <=> intersection nonempty
    u = x.union(y)
    assert x.contains_interval(y) == (u.lo == x.lo and u.hi == x.hi)
    assert x.intersects(y) == (not x.intersection(y).is_empty())


def test_basic():
    unit = R1Interval(0.0, 1.0)
    negunit = R1Interval(-1.0, 0.0)
    assert unit.lo == 0.0 and unit.hi == 1.0
    half = R1Interval(0.5, 0.5)
    assert not unit.is_empty() and not half.is_empty()
    assert R1Interval.empty().is_empty()
    assert unit.get_center() == 0.5
    assert half.get_center() == 0.5
    assert negunit.get_length() == 1.0
    assert half.get_length() == 0.0
    assert R1Interval.empty().get_length() < 0.0


def test_interval_ops_truth_table():
    # mirror of test_r1interval_port.rs:82-146 table
    empty = R1Interval.empty()
    unit = R1Interval(0.0, 1.0)
    half = R1Interval(0.5, 0.5)
    _ops(empty, empty, "TTFF")
    _ops(empty, unit, "FFFF")
    _ops(unit, half, "TTTT")
    _ops(unit, unit, "TFTT")
    _ops(unit, empty, "TTFF")
    _ops(unit, R1Interval(0.0, 0.5), "TFTT")
    _ops(unit, R1Interval(0.25, 0.75), "TTTT")


def test_add_point_and_project():
    r = R1Interval.empty()
    r.add_point(5.0)
    assert r.lo == 5.0 and r.hi == 5.0
    r.add_point(-5.0)
    assert r.lo == -5.0 and r.hi == 5.0
    assert r.project(-7.0) == -5.0
    assert r.project(7.0) == 5.0
    assert r.project(0.3) == 0.3


def test_expanded():
    empty = R1Interval.empty()
    unit = R1Interval(0.0, 1.0)
    assert empty.expanded(0.45).is_empty()
    e = unit.expanded(0.5)
    assert e.lo == -0.5 and e.hi == 1.5
    s = unit.expanded(-0.5)
    assert s.lo == 0.5 and s.hi == 0.5
    assert unit.expanded(-0.51).is_empty()


def test_union_intersection_goldens():
    unit = R1Interval(0.0, 1.0)
    negunit = R1Interval(-1.0, 0.0)
    half = R1Interval(0.5, 0.5)
    empty = R1Interval.empty()
    u = unit.union(negunit)
    assert u.lo == -1.0 and u.hi == 1.0
    i = unit.intersection(negunit)
    assert i.lo == 0.0 and i.hi == 0.0
    assert unit.union(empty).lo == unit.lo
    assert unit.intersection(half).lo == 0.5
    assert empty.union(empty).is_empty()
