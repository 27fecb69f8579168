"""S1Angle conversions mirroring the reference's DIVERGENT angle.rs.

The reference does NOT use plain multiply-by-constant conversions: it
pins five special degree values to exact radian constants on the way in
(angle.rs:61-77: ±45 -> ±PI/4, ±90 -> ±PI/2, 180 -> PI) and snaps
radians back to those degree values through an approx_eq(<1 ulp of 1.0)
window on the way out (angle.rs:122-137).  On this platform the pinned
from_degrees cases happen to agree with plain multiplication, but the
snap-back window is wider than one ulp of PI/4, so ``degrees`` is
observably divergent for sub-epsilon neighbors of the pinned radians
(see test_snap_back_window_is_observable); the port preserves both.

Everything is vectorized numpy over float64 arrays (scalars broadcast),
matching the engine's Arrow-batch kernel convention.

- e5/e6/e7 round half-AWAY-from-zero (Rust f64::round, angle.rs:141-155)
  — np.round would be half-even.
- ``normalized`` replays the reference's iterative +/-2PI loop
  (angle.rs:158-180) rather than a remainder: repeated subtraction
  accumulates different ulps than fmod for huge angles, and the loop is
  the pinned behavior.  Inf/NaN pass through untouched.
- ``from_points`` = atan2(|a x b|, a.b) (point.rs:121-125), re-exported
  from kernels.snap.point_angle.
"""

from __future__ import annotations

import numpy as np

from .snap import point_angle as from_points  # noqa: F401  (re-export)

PI = np.pi
PI_2 = np.pi / 2.0
PI_4 = np.pi / 4.0
PI2 = 2.0 * np.pi
DEG_TO_RAD = np.pi / 180.0
RAD_TO_DEG = 180.0 / np.pi
_EPS = np.finfo(np.float64).eps

_DEG_PINS = ((180.0, PI), (90.0, PI_2), (45.0, PI_4),
             (-90.0, -PI_2), (-45.0, -PI_4))


def from_degrees(deg) -> np.ndarray:
    """Degrees -> radians with the five pinned exact cases
    (angle.rs:61-77)."""
    deg = np.asarray(deg, np.float64)
    rad = deg * DEG_TO_RAD
    for d, r in _DEG_PINS:
        rad = np.where(deg == d, r, rad)
    return rad


def degrees(rad) -> np.ndarray:
    """Radians -> degrees with approx_eq snapping to the five pinned
    cases (angle.rs:122-137; approx_eq = |a-b| < f64::EPSILON,
    math.rs)."""
    rad = np.asarray(rad, np.float64)
    deg = rad * RAD_TO_DEG
    for d, r in _DEG_PINS:
        deg = np.where(np.abs(rad - r) < _EPS, d, deg)
    return deg


def from_e5(e5) -> np.ndarray:
    return from_degrees(np.asarray(e5, np.float64) * 1e-5)


def from_e6(e6) -> np.ndarray:
    return from_degrees(np.asarray(e6, np.float64) * 1e-6)


def from_e7(e7) -> np.ndarray:
    return from_degrees(np.asarray(e7, np.float64) * 1e-7)


def from_unsigned_e6(e6) -> np.ndarray:
    """u32 bits reinterpreted as i32 (angle.rs:99-101)."""
    return from_e6(np.asarray(e6, np.uint32).astype(np.int32))


def from_unsigned_e7(e7) -> np.ndarray:
    return from_e7(np.asarray(e7, np.uint32).astype(np.int32))


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.trunc(x + np.copysign(0.5, x))


def e5(rad) -> np.ndarray:
    """round(degrees * 1e5) as i32, half away from zero
    (angle.rs:141-143)."""
    return _round_half_away(degrees(rad) * 1e5).astype(np.int32)


def e6(rad) -> np.ndarray:
    return _round_half_away(degrees(rad) * 1e6).astype(np.int32)


def e7(rad) -> np.ndarray:
    return _round_half_away(degrees(rad) * 1e7).astype(np.int32)


def normalized(rad) -> np.ndarray:
    """Normalize to (-PI, PI] via the reference's iterative loop
    (angle.rs:158-180): subtract/add 2PI until in range, then snap
    approx-(-PI) to +PI.  Inf/NaN unchanged."""
    r = np.array(np.asarray(rad, np.float64), copy=True, ndmin=1)
    finite = np.isfinite(r)
    while True:
        m = finite & (r > PI)
        if not m.any():
            break
        r[m] -= PI2
    while True:
        m = finite & (r <= -PI)
        if not m.any():
            break
        r[m] += PI2
    snap = finite & (np.abs(r - (-PI)) < _EPS)
    r[snap] = PI
    if np.ndim(rad) == 0:
        return r[0]
    return r
