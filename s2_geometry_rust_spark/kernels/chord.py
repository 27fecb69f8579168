"""S1ChordAngle helpers (squared-chord-length distance proxy).

Mirrors ``/root/reference/src/chord_angle.rs``.  Represented as plain
floats (length2 in [0,4], -1 = negative sentinel, +inf = infinity) so
they vectorize trivially.
"""

from __future__ import annotations

import numpy as np

STRAIGHT = 4.0
NEGATIVE = -1.0
INFINITY = float("inf")


def from_length2(length2):
    """Clamp above at 4 (chord_angle.rs:77-81)."""
    return np.minimum(np.asarray(length2, dtype=np.float64), 4.0)


def between_points(ax, ay, az, bx, by, bz):
    """Squared chord distance between unit points (chord_angle.rs:90-98)."""
    dx = np.asarray(ax, dtype=np.float64) - bx
    dy = np.asarray(ay, dtype=np.float64) - by
    dz = np.asarray(az, dtype=np.float64) - bz
    return np.minimum(dx * dx + dy * dy + dz * dz, 4.0)


def from_radians(radians):
    """angle -> length2 = (2 sin(a/2))^2 (chord_angle.rs:102-113)."""
    r = np.asarray(radians, dtype=np.float64)
    half = np.sin(0.5 * np.minimum(r, np.pi))
    length = 2.0 * half
    l2 = length * length
    l2 = np.where(r < 0.0, NEGATIVE, l2)
    l2 = np.where(np.isposinf(r), INFINITY, l2)
    return l2


def to_radians(length2):
    """length2 -> angle = 2 asin(sqrt(l2)/2) (chord_angle.rs:155-163)."""
    l2 = np.asarray(length2, dtype=np.float64)
    r = 2.0 * np.arcsin(0.5 * np.sqrt(np.maximum(l2, 0.0)))
    r = np.where(l2 < 0.0, -1.0, r)
    r = np.where(np.isposinf(l2), INFINITY, r)
    return r


def add(a2, b2):
    """Chord-angle addition (chord_angle.rs Add impl)."""
    a2 = np.asarray(a2, dtype=np.float64)
    b2 = np.asarray(b2, dtype=np.float64)
    x = a2 * (1.0 - 0.25 * b2)
    y = b2 * (1.0 - 0.25 * a2)
    out = np.minimum(x + y + 2.0 * np.sqrt(np.maximum(x * y, 0.0)), 4.0)
    out = np.where(b2 == 0.0, a2, out)
    out = np.where(a2 + b2 >= 4.0, STRAIGHT, out)
    return out


def sub(a2, b2):
    """Chord-angle subtraction (chord_angle.rs Sub impl)."""
    a2 = np.asarray(a2, dtype=np.float64)
    b2 = np.asarray(b2, dtype=np.float64)
    x = a2 * (1.0 - 0.25 * b2)
    y = b2 * (1.0 - 0.25 * a2)
    c = np.maximum(np.sqrt(np.maximum(x, 0.0)) - np.sqrt(np.maximum(y, 0.0)), 0.0)
    out = c * c
    out = np.where(b2 == 0.0, a2, out)
    out = np.where(a2 <= b2, 0.0, out)
    return out


def sin(length2):
    """chord_angle.rs sin(): sqrt(sin2)."""
    return np.sqrt(sin2(length2))


def cos(length2):
    return 1.0 - 0.5 * np.asarray(length2, dtype=np.float64)


def sin2(length2):
    """sin^2(a) = l2 * (1 - l2/4)."""
    l2 = np.asarray(length2, dtype=np.float64)
    return l2 * (1.0 - 0.25 * l2)


def successor(length2):
    """Next larger representable chord angle (chord_angle.rs:232-239):
    >= straight -> infinity, negative -> zero, else nextafter toward
    10.0."""
    if length2 >= STRAIGHT:
        return INFINITY
    if length2 < 0.0:
        return 0.0
    return float(np.nextafter(length2, 10.0))


def predecessor(length2):
    """Next smaller representable chord angle (chord_angle.rs:242-250):
    <= zero -> negative, > straight -> straight, else nextafter toward
    -10.0."""
    if length2 <= 0.0:
        return NEGATIVE
    if length2 > STRAIGHT:
        return STRAIGHT
    return float(np.nextafter(length2, -10.0))


def _is_special(length2):
    return length2 < 0.0 or length2 == INFINITY


def plus_error(length2, error):
    """Add an error bound, clamped to [0, 4]; special values pass
    through (chord_angle.rs:253-259)."""
    if _is_special(length2):
        return length2
    return min(max(length2 + error, 0.0), STRAIGHT)


def s2_point_constructor_max_error(length2):
    """chord_angle.rs:262-266."""
    eps = np.finfo(np.float64).eps
    return 4.5 * eps * length2 + 16.0 * eps * eps


def s1_angle_constructor_max_error(length2):
    """chord_angle.rs:269-272."""
    return 1.5 * np.finfo(np.float64).eps * length2


def fast_upper_bound_from(radians):
    """chord_angle.rs:145-152: length2 = radians^2, a guaranteed upper
    bound on the true chord angle (within 1% below ~0.5 rad)."""
    return from_length2(radians * radians)
