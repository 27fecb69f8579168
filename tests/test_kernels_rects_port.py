"""S2LatLngRect golden parity mirrored from
/root/reference/tests/test_s2latlng_rect_port.rs (family-1 suite).

NOTE on argument order: the kernel's from_degrees(lat_lo, lng_lo,
lat_hi, lng_hi) mirrors the reference helper rect_from_degrees.
"""

import math

import numpy as np

from s2_geometry_rust_spark.kernels.intervals import R1Interval, S1Interval
from s2_geometry_rust_spark.kernels.rects import S2LatLngRect
from s2_geometry_rust_spark.kernels import latlng as lk

PI = math.pi
PI_2 = math.pi / 2
PI_4 = math.pi / 4


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    return S2LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def test_empty_and_full():
    empty, full = S2LatLngRect.empty(), S2LatLngRect.full()
    assert empty.is_empty() and not empty.is_full()
    assert full.is_full() and not full.is_empty()


def test_accessors():
    d1 = rect_deg(-90.0, 0.0, -45.0, 180.0)
    assert abs(math.degrees(d1.lat.lo) - (-90.0)) < 1e-13
    assert abs(math.degrees(d1.lat.hi) - (-45.0)) < 1e-13
    assert abs(math.degrees(d1.lng.lo) - 0.0) < 1e-13
    assert abs(math.degrees(d1.lng.hi) - 180.0) < 1e-13


def test_from_point_pair():
    # (-35,-140) x (15,155) -> [-35,15] lat, lng inverted [155,-140]
    r = S2LatLngRect.from_point_pair(
        math.radians(-35.0), math.radians(-140.0),
        math.radians(15.0), math.radians(155.0),
    )
    want = rect_deg(-35.0, 155.0, 15.0, -140.0)
    assert r.approx_equals(want, 1e-13)
    r2 = S2LatLngRect.from_point_pair(
        math.radians(25.0), math.radians(-70.0),
        math.radians(-90.0), math.radians(80.0),
    )
    want2 = rect_deg(-90.0, -70.0, 25.0, 80.0)
    assert r2.approx_equals(want2, 1e-13)


def test_get_center_size():
    r1 = S2LatLngRect(R1Interval(0.0, PI_2), S1Interval.new(-PI, 0.0))
    clat, clng = r1.get_center()
    assert clat == PI_4 and clng == -PI_2
    slat, slng = r1.get_size()
    assert slat == PI_2 and slng == PI
    elat, elng = S2LatLngRect.empty().get_size()
    assert elat < 0.0 and elng < 0.0


def test_get_vertex():
    r1 = S2LatLngRect(R1Interval(0.0, PI_2), S1Interval.new(-PI, 0.0))
    assert r1.get_vertex(0) == (0.0, PI)  # -pi normalized to pi by S1
    v1 = r1.get_vertex(1)
    assert v1 == (0.0, 0.0)
    assert r1.get_vertex(2) == (PI_2, 0.0)
    v3 = r1.get_vertex(3)
    assert v3[0] == PI_2


def test_contains():
    r1 = S2LatLngRect.from_point_pair(0.0, -PI, PI_2, 0.0)
    assert r1.contains_latlng(math.radians(30.0), math.radians(-45.0))
    assert not r1.contains_latlng(math.radians(30.0), math.radians(45.0))
    assert r1.contains_latlng(0.0, -PI)
    assert r1.contains_latlng(PI_2, 0.0)
    # S2Point containment (test goldens: (0.5,-0.3,0.1) in, (0.5,0.2,0.1) out)
    def unit(x, y, z):
        v = np.array([x, y, z]) / np.linalg.norm([x, y, z])
        return float(v[0]), float(v[1]), float(v[2])

    assert r1.contains_point(*unit(0.5, -0.3, 0.1))
    assert not r1.contains_point(*unit(0.5, 0.2, 0.1))


def test_add_point_and_expanded():
    r = S2LatLngRect.empty()
    r.add_point(0.0, 0.0)
    r.add_point(math.radians(30.0), math.radians(40.0))
    assert r.contains_latlng(math.radians(15.0), math.radians(20.0))
    grown = r.expanded(math.radians(5.0), math.radians(5.0))
    assert grown.contains_latlng(math.radians(-4.0), math.radians(-4.0))
    assert not grown.contains_latlng(math.radians(-6.0), math.radians(0.0))


def test_union_intersection():
    a = rect_deg(0.0, 0.0, 30.0, 30.0)
    b = rect_deg(20.0, 20.0, 50.0, 50.0)
    u = a.union(b)
    i = a.intersection(b)
    assert u.contains_rect(a) and u.contains_rect(b)
    assert i.approx_equals(rect_deg(20.0, 20.0, 30.0, 30.0), 1e-13)
    assert a.intersects(b)
    assert not a.intersects(rect_deg(60.0, 60.0, 70.0, 70.0))


def test_wraparound_rect():
    wrap = rect_deg(-10.0, 170.0, 10.0, -170.0)
    assert wrap.contains_latlng(0.0, math.radians(175.0))
    assert wrap.contains_latlng(0.0, math.radians(-175.0))
    assert not wrap.contains_latlng(0.0, 0.0)
    assert wrap.intersects(rect_deg(-5.0, 175.0, 5.0, 179.0))
