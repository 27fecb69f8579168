"""S1ChordAngle golden parity mirrored from
/root/reference/tests/test_s1chord_angle_port.rs."""

import math

import numpy as np

from s2_geometry_rust_spark.kernels import chord

PI = math.pi


def test_two_point_constructor_goldens():
    rng = np.random.default_rng(77)
    for _ in range(20):
        x = rng.normal(size=3)
        x /= np.linalg.norm(x)
        y = np.cross(x, rng.normal(size=3))
        y /= np.linalg.norm(y)
        z = np.cross(x, y)
        z /= np.linalg.norm(z)
        # same point -> 0
        assert abs(float(chord.to_radians(
            chord.between_points(*z, *z)))) < 1e-15
        # antipodal -> pi
        assert abs(float(chord.to_radians(
            chord.between_points(*(-z), *z))) - PI) < 1e-7
        # orthogonal -> pi/2
        assert abs(float(chord.to_radians(
            chord.between_points(*x, *z))) - PI / 2) < 1e-13
        # 45 degrees
        w = y + z
        w /= np.linalg.norm(w)
        assert abs(float(chord.to_radians(
            chord.between_points(*w, *z))) - PI / 4) < 1e-13


def test_from_length2_goldens():
    deg = lambda l2: math.degrees(float(chord.to_radians(chord.from_length2(l2))))
    assert deg(0.0) == 0.0
    assert abs(deg(1.0) - 60.0) < 1e-13
    assert abs(deg(2.0) - 90.0) < 1e-13
    assert deg(4.0) == 180.0
    assert deg(5.0) == 180.0  # clamped


def test_constants():
    assert float(chord.to_radians(0.0)) == 0.0
    assert abs(math.degrees(float(chord.to_radians(2.0))) - 90.0) < 1e-13
    assert float(chord.to_radians(chord.STRAIGHT)) == PI
    assert chord.STRAIGHT < chord.INFINITY
    assert chord.NEGATIVE < 0.0
    assert float(chord.to_radians(chord.NEGATIVE)) < 0.0


def test_from_radians_roundtrip():
    for r in (0.0, 0.1, PI / 4, PI / 2, 1.0, 2.0, PI):
        l2 = float(chord.from_radians(r))
        back = float(chord.to_radians(l2))
        assert abs(back - r) < 1e-13
    assert float(chord.from_radians(-1.0)) == chord.NEGATIVE
    assert float(chord.from_radians(float("inf"))) == chord.INFINITY


def test_arithmetic():
    a = float(chord.from_radians(0.3))
    b = float(chord.from_radians(0.4))
    s = float(chord.to_radians(chord.add(a, b)))
    assert abs(s - 0.7) < 1e-12
    d = float(chord.to_radians(chord.sub(b, a)))
    assert abs(d - 0.1) < 1e-11
    assert float(chord.add(a, 0.0)) == a
    assert float(chord.sub(a, b)) == 0.0  # a <= b -> 0
    # saturation at straight
    big = float(chord.from_radians(3.0))
    assert float(chord.add(big, big)) == chord.STRAIGHT


def test_trig():
    for r in (0.0, 0.2, PI / 3, PI / 2, 2.5):
        l2 = float(chord.from_radians(r))
        assert abs(float(chord.sin(l2)) - math.sin(r)) < 1e-12
        assert abs(float(chord.cos(l2)) - math.cos(r)) < 1e-12
