"""Snap-function kernels for the builder subsystem (vectorized numpy).

Mirrors /root/reference/src/builder/snap_functions.rs: the three snap
families (Identity, IntLatLng, S2CellId) plus their snap-radius /
min-vertex-separation metadata formulas — including the reference's own
conservative (non-canonical-S2) bounds, reproduced verbatim:

- IntLatLng snap radius   = 1/(2*scale) * pi/180 * sqrt(2)
  (snap_functions.rs:168-175)
- IntLatLng min separation = 1/scale * pi/180 * 0.5
  (snap_functions.rs:178-184)
- S2CellId snap radius    = avg_edge(level) * sqrt(2)/2 with
  avg_edge deriv 1.459213746386106062 (snap_functions.rs:253-259,
  cell_id.rs:95)
- S2CellId min separation = pi / 2^level * 0.8
  (snap_functions.rs:262-267)

Snapping itself:
- IntLatLng: degrees scaled, rounded HALF-AWAY-FROM-ZERO (Rust
  f64::round, snap_functions.rs:190-199), back through
  from_degrees -> to_point.
- S2CellId: leaf id -> parent at level -> to_point (cell_id.rs:688
  delegates to the approximate to_point_raw, cell_id.rs:421-433 —
  the engine kernel reproduces that quirk, SURVEY.md §8.2).
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ck
from . import latlng as lk

# cell_id.rs:95 — AVG_EDGE_METRIC deriv (quadratic projection value)
AVG_EDGE_DERIV = 1.459213746386106062
MAX_LEVEL = 30

# builder/graph.rs:404-409 — edges shorter than this angle are degenerate
DEGENERATE_EDGE_ANGLE = 1e-15

# builder/mod.rs:178-183 — |dot + 1| < this means antipodal (invalid edge)
ANTIPODAL_DOT_TOL = 1e-15

# builder/mod.rs:128-136 — split_crossing_edges forces a tolerance floor
INTERSECTION_ERROR_FLOOR = 1e-15


def metric_value(deriv: float, level: int, dim: int = 1) -> float:
    """LengthMetric::get_value (cell_id.rs:74-76)."""
    return deriv / float(1 << (dim * level))


def metric_closest_level(deriv: float, value: float, dim: int = 1) -> int:
    """LengthMetric::get_closest_level (cell_id.rs:79-87)."""
    if value <= 0.0:
        return MAX_LEVEL
    level = round(math.log2(value / deriv) / dim)
    return max(0, min(MAX_LEVEL, int(level)))


def int_latlng_snap_radius(scale: float) -> float:
    """snap_functions.rs:168-175 (reference's conservative bound)."""
    max_err = 1.0 / (2.0 * scale) * math.pi / 180.0
    return max_err * math.sqrt(2.0)


def int_latlng_min_separation(scale: float) -> float:
    """snap_functions.rs:178-184."""
    return (1.0 / scale) * math.pi / 180.0 * 0.5


def cellid_snap_radius(level: int) -> float:
    """snap_functions.rs:253-259."""
    return metric_value(AVG_EDGE_DERIV, level) * math.sqrt(2.0) / 2.0


def cellid_min_separation(level: int) -> float:
    """snap_functions.rs:262-267."""
    return math.pi / float(1 << level) * 0.8


def _round_half_away(a: np.ndarray) -> np.ndarray:
    """Rust f64::round — ties away from zero (np.rint is half-even)."""
    return np.trunc(a + np.copysign(0.5, a))


def snap_identity(x, y, z):
    """IdentitySnapFunction — no transformation (snap_functions.rs:103)."""
    return np.asarray(x, np.float64), np.asarray(y, np.float64), \
        np.asarray(z, np.float64)


def snap_int_latlng(x, y, z, scale: float):
    """IntLatLngSnapFunction::snap_point (snap_functions.rs:190-199):
    xyz -> lat/lng degrees -> round(deg*scale)/scale -> back to xyz."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    lat_deg = lk.radians_to_degrees(lk.xyz_to_lat(x, y, z))
    lng_deg = lk.radians_to_degrees(lk.xyz_to_lng(x, y, z))
    lat_s = _round_half_away(lat_deg * scale) / scale
    lng_s = _round_half_away(lng_deg * scale) / scale
    return lk.latlng_to_xyz(
        lk.degrees_to_radians(lat_s), lk.degrees_to_radians(lng_s)
    )


def snap_int_latlng_grid(x, y, z, scale: float):
    """The integer grid coordinates the IntLatLng snap rounds to —
    (round(lat_deg*scale), round(lng_deg*scale)) as int64.  Exposed so
    table operators can carry the exact snap-site identity as two
    BIGINT columns (SQL-replayable)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    lat_deg = lk.radians_to_degrees(lk.xyz_to_lat(x, y, z))
    lng_deg = lk.radians_to_degrees(lk.xyz_to_lng(x, y, z))
    return (
        _round_half_away(lat_deg * scale).astype(np.int64),
        _round_half_away(lng_deg * scale).astype(np.int64),
    )


def snap_cell_center(x, y, z, level: int):
    """S2CellIdSnapFunction::snap_point (snap_functions.rs:271-276):
    leaf cell from point -> parent at ``level`` -> (approximate) cell
    center.  Raises on level outside [0, 30] like the reference panics
    (snap_functions.rs:238-241)."""
    if level < 0 or level > MAX_LEVEL:
        raise ValueError("S2CellId level must be in range [0, 30]")
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    leaf = ck.from_point(x, y, z)
    parent = ck.parent_at_level(leaf, level)
    return ck.to_point_raw(parent)


def point_angle(ax, ay, az, bx, by, bz):
    """S2Point::angle (point.rs:121-125): atan2(|a×b|, a·b)."""
    cx = np.asarray(ay) * bz - np.asarray(az) * by
    cy = np.asarray(az) * bx - np.asarray(ax) * bz
    cz = np.asarray(ax) * by - np.asarray(ay) * bx
    cross_len = np.sqrt(cx * cx + cy * cy + cz * cz)
    dot = np.asarray(ax) * bx + np.asarray(ay) * by + np.asarray(az) * bz
    return np.arctan2(cross_len, dot)


def apply_snap(x, y, z, snap: str, *, scale: float = 1e6,
               level: int = 10):
    """Dispatch over the SnapFunction enum (snap_functions.rs:345-355).
    ``snap`` in {"identity", "int_latlng", "cellid"}."""
    if snap == "identity":
        return snap_identity(x, y, z)
    if snap == "int_latlng":
        return snap_int_latlng(x, y, z, scale)
    if snap == "cellid":
        return snap_cell_center(x, y, z, level)
    raise ValueError(f"unknown snap function {snap!r}")
