"""Mirror of the reference's S1Angle / S2Point port suites
(tests/test_s1angle_port.rs:13-292, tests/test_s2point_port.rs:100-203)
— the last two family-1 golden suites without an engine twin.

The angle surface ports angle.rs's DIVERGENT conversions (pinned exact
degree<->radian cases, approx_eq snap-back, half-away e-notation
rounding, iterative normalize); the point surface re-checks the engine
helpers those reference tests exercise (snap.point_angle,
polylines slerp, chord relations).
"""

from __future__ import annotations

import numpy as np
import pytest

from s2_geometry_rust_spark.kernels import angle as ang
from s2_geometry_rust_spark.kernels import chord
from s2_geometry_rust_spark.kernels import polylines as pl
from s2_geometry_rust_spark.kernels.snap import point_angle

PI, PI_2, PI_4 = np.pi, np.pi / 2, np.pi / 4


# ---- S1Angle (test_s1angle_port.rs) --------------------------------

def test_pi_radians_exactly_180_degrees():
    # test_s1angle_port.rs:38-49 — the pinned-exact conversions
    assert ang.from_degrees(180.0) == PI
    assert ang.degrees(PI) == 180.0
    assert ang.degrees(ang.from_degrees(180.0)) == 180.0
    assert ang.degrees(PI_2) == 90.0
    assert ang.degrees(-PI_2) == -90.0
    assert ang.from_degrees(-45.0) == -PI_4


def test_snap_back_window_is_observable():
    # The approx_eq(<f64::EPSILON) snap-back (angle.rs:122-137) is wider
    # than one ulp of PI_4 (ulp in [0.5,1) is eps/2), so the nearest f64
    # below PI/4 snaps to exactly 45.0 where plain multiplication gives
    # 44.99999999999999 — the pinned behavior is observable.
    near = np.nextafter(PI_4, 0.0)
    assert float(near * (180.0 / np.pi)) != 45.0
    assert ang.degrees(near) == 45.0
    # One ulp of PI (in [2,4)) exceeds EPSILON, so only exact PI snaps.
    assert ang.degrees(np.nextafter(PI, 0.0)) != 180.0


def test_e5_e6_e7_representations():
    # test_s1angle_port.rs:54-76
    assert abs(ang.from_degrees(-45.0) - ang.from_e5(-4500000)) < 1e-15
    assert abs(ang.from_degrees(-60.0) - ang.from_e6(-60000000)) < 1e-15
    assert abs(ang.from_degrees(75.0) - ang.from_e7(750000000)) < 1e-15
    assert ang.e5(ang.from_degrees(-172.56123)) == -17256123
    assert ang.e6(ang.from_degrees(12.345678)) == 12345678
    assert ang.e7(ang.from_degrees(-12.3456789)) == -123456789


def test_e6_e7_representations_unsigned():
    # test_s1angle_port.rs:79-103 — u32 bits reinterpreted as i32
    assert abs(ang.from_degrees(60.0)
               - ang.from_unsigned_e6(np.uint32(60000000))) < 1e-15
    assert abs(ang.from_degrees(-60.0)
               - ang.from_unsigned_e6(np.int64(-60000000)
                                      .astype(np.uint32))) < 1e-15
    assert abs(ang.from_degrees(75.0)
               - ang.from_unsigned_e7(np.uint32(750000000))) < 1e-15
    assert abs(ang.from_degrees(-75.0)
               - ang.from_unsigned_e7(np.int64(-750000000)
                                      .astype(np.uint32))) < 1e-15


def test_normalize_correctly_canonicalizes_angles():
    # test_s1angle_port.rs:105-114
    for deg, want in [(360.0, 0.0), (-90.0, -90.0), (-180.0, 180.0),
                      (180.0, 180.0), (540.0, 180.0), (-270.0, 90.0)]:
        got = ang.degrees(ang.normalized(ang.from_degrees(deg)))
        assert abs(got - want) < 1e-12, (deg, got, want)


def test_normalized_huge_and_nonfinite():
    # test_s1angle_port.rs:269-281 + the inf/nan passthrough
    norm = ang.normalized(1000.0 * PI)
    assert abs(norm) <= PI
    assert np.isinf(ang.normalized(np.inf))
    assert np.isnan(ang.normalized(np.nan))
    # vectorized form with mixed finite/non-finite elements
    out = ang.normalized(np.array([np.inf, 3 * PI, -np.inf, -PI]))
    assert np.isinf(out[0]) and np.isinf(out[2])
    assert abs(out[1] - PI) < 1e-12
    assert out[3] == PI  # -PI maps to +PI


def test_degrees_vs_e6_e7_exact_integers():
    # test_s1angle_port.rs:187-213: integer degrees convert exactly
    i = np.arange(0, 181)
    assert np.array_equal(ang.from_degrees(i.astype(np.float64)),
                          ang.from_e6(1000000 * i))
    assert np.array_equal(ang.from_degrees(i.astype(np.float64)),
                          ang.from_e7(10000000 * i))
    rng = np.random.default_rng(42)
    j = rng.integers(0, 180000000, 100)
    assert np.array_equal(ang.from_e6(j), ang.from_e7(10 * j))


def test_degrees_vs_radians_exact_identities():
    # test_s1angle_port.rs:227-262
    k = np.arange(-8, 9).astype(np.float64)
    assert np.array_equal(ang.from_degrees(45.0 * k), k * PI / 4.0)
    assert np.array_equal(ang.degrees(ang.from_degrees(45.0 * k)), 45.0 * k)
    for kk in range(0, 21):
        n = float(1 << kk)
        assert ang.from_degrees(180.0 / n) == PI / n
        assert ang.from_degrees(60.0 / n) == PI / (3.0 * n)
        assert ang.from_degrees(36.0 / n) == PI / (5.0 * n)
        assert ang.from_degrees(20.0 / n) == PI / (9.0 * n)
        assert ang.from_degrees(4.0 / n) == PI / (45.0 * n)
    # spot-check a non-identity
    assert ang.from_degrees(3.0) != PI / 60.0


def test_trigonometry_and_special_angles():
    # test_s1angle_port.rs:148-163, 292-307
    assert abs(np.cos(ang.from_degrees(0.0)) - 1.0) < 1e-15
    assert abs(np.sin(ang.from_degrees(90.0)) - 1.0) < 1e-15
    assert abs(np.tan(ang.from_degrees(45.0)) - 1.0) < 1e-15
    assert abs(np.sin(ang.from_degrees(30.0)) - 0.5) < 1e-15
    assert abs(np.cos(ang.from_degrees(30.0)) - np.sqrt(3.0) / 2) < 1e-15
    assert ang.from_degrees(0.0) == 0.0
    assert ang.from_degrees(90.0) == PI_2
    assert ang.from_degrees(-90.0) == -PI_2
    assert ang.from_degrees(270.0) == 270.0 * ang.DEG_TO_RAD


def test_constructors_that_measure_angles():
    # test_s1angle_port.rs:166-177 (S2Point::new normalizes (0,0,2))
    assert abs(point_angle(1, 0, 0, 0, 0, 1) - PI_2) < 1e-13
    assert abs(point_angle(1, 0, 0, 1, 0, 0)) < 1e-15


# ---- S2Point (test_s2point_port.rs) --------------------------------

def test_point_angles():
    # test_s2point_port.rs:118-135
    assert abs(point_angle(1, 0, 0, 0, 1, 0) - PI_2) < 1e-15
    assert abs(point_angle(1, 0, 0, 0, 0, 1) - PI_2) < 1e-15
    assert abs(point_angle(0, 1, 0, 0, 0, 1) - PI_2) < 1e-15
    assert abs(point_angle(1, 0, 0, 1, 0, 0)) < 1e-15
    assert abs(point_angle(1, 0, 0, -1, 0, 0) - PI) < 1e-15


def test_point_interpolation():
    # test_s2point_port.rs:138-162 via the polyline slerp kernel
    p1 = np.array([1.0, 0.0, 0.0])
    p2 = np.array([0.0, 1.0, 0.0])
    assert np.allclose(pl._slerp(p1, p2, 0.0), p1, atol=1e-15)
    assert np.allclose(pl._slerp(p1, p2, 1.0), p2, atol=1e-15)
    mid = pl._slerp(p1, p2, 0.5)
    assert abs(np.linalg.norm(mid) - 1.0) < 1e-15
    d1 = point_angle(*mid, *p1)
    d2 = point_angle(*mid, *p2)
    assert abs(d1 - d2) < 1e-15


def test_point_distances_chord_relation():
    # test_s2point_port.rs:165-181: chord = 2 sin(angle/2)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    angle = point_angle(*a, *b)
    chord2 = chord.between_points(*a, *b)
    expected = 2.0 * np.sin(angle / 2.0)
    assert abs(np.sqrt(chord2) - expected) < 1e-15
    assert abs(chord.to_radians(chord2) - angle) < 1e-15


def test_cross_product():
    # test_s2point_port.rs:184-200
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    c = np.cross(a, b)
    assert np.allclose(c, [0.0, 0.0, 1.0], atol=1e-15)
    assert abs(np.linalg.norm(c) - np.sin(point_angle(*a, *b))) < 1e-15


def test_point_normalization():
    # test_s2point_port.rs:100-114
    v = np.array([3.0, 4.0, 0.0])
    n = v / np.linalg.norm(v)
    assert abs(np.linalg.norm(n) - 1.0) < 1e-15
    assert abs(n[0] - 0.6) < 1e-15 and abs(n[1] - 0.8) < 1e-15
