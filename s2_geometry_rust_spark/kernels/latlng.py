"""Lat/lng <-> point conversions (mirrors /root/reference/src/latlng.rs
and src/angle.rs).

Key reference quirks reproduced:
- ``from_degrees`` snaps +/-45, +/-90 and 180 (but NOT -180) degrees to
  exact radian constants (angle.rs:61-77);
- ``latitude``/``longitude`` add ``+0.0`` to canonicalize -0 before atan2
  (latlng.rs:127-140);
- ``get_distance`` is the haversine formula with atan2 stabilization
  (latlng.rs:234-250);
- ``normalized`` clamps lat and wraps lng via rem_euclid
  (latlng.rs:174-204).
"""

from __future__ import annotations

import numpy as np

PI = np.pi
PI_2 = np.pi / 2.0
PI_4 = np.pi / 4.0
DEG_TO_RAD = np.pi / 180.0
RAD_TO_DEG = 180.0 / np.pi
EPS = np.finfo(np.float64).eps


def degrees_to_radians(deg):
    """S1Angle::from_degrees with its exact special cases
    (angle.rs:61-77).

    The special values are rare in bulk data, so they are patched with
    masked assignment instead of five full-array np.where blends (each
    a 3-array pass) — 3x fewer memory passes, identical outputs."""
    deg = np.asarray(deg, dtype=np.float64)
    r = deg * DEG_TO_RAD
    if deg.ndim == 0:
        for val, out in ((180.0, PI), (90.0, PI_2), (45.0, PI_4),
                         (-90.0, -PI_2), (-45.0, -PI_4)):
            if deg == val:
                return np.float64(out)
        return r
    for val, out in ((180.0, PI), (90.0, PI_2), (45.0, PI_4),
                     (-90.0, -PI_2), (-45.0, -PI_4)):
        m = deg == val
        if m.any():
            r[m] = out
    return r


def radians_to_degrees(rad):
    """S1Angle::degrees with approx-eq special cases (angle.rs:122-137)."""
    rad = np.asarray(rad, dtype=np.float64)
    d = rad * RAD_TO_DEG
    d = np.where(np.abs(rad - PI) < EPS, 180.0, d)
    d = np.where(np.abs(rad - PI_2) < EPS, 90.0, d)
    d = np.where(np.abs(rad - PI_4) < EPS, 45.0, d)
    d = np.where(np.abs(rad + PI_2) < EPS, -90.0, d)
    d = np.where(np.abs(rad + PI_4) < EPS, -45.0, d)
    return d


def e_to_radians(e, k: int):
    """E5/E6/E7 fixed point -> radians (angle.rs:81-95)."""
    return degrees_to_radians(np.asarray(e, dtype=np.float64) * (10.0 ** -k))


def latlng_to_xyz(lat_rad, lng_rad):
    """(lat,lng) radians -> unit xyz (latlng.rs:207-227); then normalized
    by S2Point::new (division by sqrt(length_squared))."""
    lat = np.asarray(lat_rad, dtype=np.float64)
    lng = np.asarray(lng_rad, dtype=np.float64)
    cos_lat = np.cos(lat)
    x = cos_lat * np.cos(lng)
    y = cos_lat * np.sin(lng)
    z = np.sin(lat)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def xyz_to_lat(x, y, z):
    """atan2-based latitude; '+0.0' canonicalizes -0 (latlng.rs:127-132)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    return np.arctan2(z + 0.0, np.sqrt(x * x + y * y))


def xyz_to_lng(x, y, z):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return np.arctan2(y + 0.0, x + 0.0)


def is_valid(lat_rad, lng_rad):
    lat = np.asarray(lat_rad, dtype=np.float64)
    lng = np.asarray(lng_rad, dtype=np.float64)
    return (np.abs(lat) <= PI_2) & (np.abs(lng) <= PI) & np.isfinite(lat) & np.isfinite(lng)


def normalized(lat_rad, lng_rad):
    """Clamp lat to [-pi/2,pi/2], wrap lng to [-pi,pi]
    (latlng.rs:174-204).  Non-finite -> invalid marker (pi, 2pi)."""
    lat = np.asarray(lat_rad, dtype=np.float64)
    lng = np.asarray(lng_rad, dtype=np.float64)
    nlat = np.clip(lat, -PI_2, PI_2)
    nlng = np.mod(lng, 2.0 * PI)  # rem_euclid
    nlng = np.where(nlng > PI, nlng - 2.0 * PI, nlng)
    bad = ~(np.isfinite(lat) & np.isfinite(lng))
    nlat = np.where(bad, PI, nlat)
    nlng = np.where(bad, 2.0 * PI, nlng)
    return nlat, nlng


def haversine_distance(lat1, lng1, lat2, lng2):
    """Great-circle distance in radians (latlng.rs:234-250)."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lng1 = np.asarray(lng1, dtype=np.float64)
    lng2 = np.asarray(lng2, dtype=np.float64)
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    a = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng * 0.5) ** 2
    return 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
