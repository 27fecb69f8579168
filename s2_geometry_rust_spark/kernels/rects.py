"""S2LatLngRect (mirrors /root/reference/src/latlng_rect.rs).

Lat is a linear R1Interval (radians), lng a circular S1Interval with
dateline wraparound.  Scalar class for region logic + vectorized
point-batch containment for the hot path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import latlng as ll
from .intervals import R1Interval, S1Interval

PI = math.pi
PI_2 = math.pi / 2.0


@dataclass
class S2LatLngRect:
    lat: R1Interval
    lng: S1Interval

    @staticmethod
    def empty() -> "S2LatLngRect":
        return S2LatLngRect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "S2LatLngRect":
        return S2LatLngRect(R1Interval(-PI_2, PI_2), S1Interval.full())

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float, lng_hi: float) -> "S2LatLngRect":
        return S2LatLngRect(
            R1Interval(float(ll.degrees_to_radians(lat_lo)),
                       float(ll.degrees_to_radians(lat_hi))),
            S1Interval.new(float(ll.degrees_to_radians(lng_lo)),
                           float(ll.degrees_to_radians(lng_hi))))

    @staticmethod
    def from_point_pair(lat1, lng1, lat2, lng2) -> "S2LatLngRect":
        return S2LatLngRect(R1Interval.from_point_pair(lat1, lat2),
                            S1Interval.from_point_pair(lng1, lng2))

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return (self.lat.lo == -PI_2 and self.lat.hi == PI_2 and self.lng.is_full())

    def contains_latlng(self, lat: float, lng: float) -> bool:
        return self.lat.contains(lat) and self.lng.contains_point(lng)

    def contains_point(self, x: float, y: float, z: float) -> bool:
        return self.contains_latlng(float(ll.xyz_to_lat(x, y, z)),
                                    float(ll.xyz_to_lng(x, y, z)))

    def contains_points_batch(self, x, y, z):
        """Vectorized point containment over arrays."""
        lat = np.asarray(ll.xyz_to_lat(x, y, z))
        lng = np.asarray(ll.xyz_to_lng(x, y, z))
        return self.contains_latlng_batch(lat, lng)

    def contains_latlng_batch(self, lat, lng):
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        lat_ok = (lat >= self.lat.lo) & (lat <= self.lat.hi)
        p = np.where(lng == -PI, PI, lng)
        if self.lng.is_inverted():
            lng_ok = ((p >= self.lng.lo) | (p <= self.lng.hi)) & ~self.lng.is_empty()
        else:
            lng_ok = (p >= self.lng.lo) & (p <= self.lng.hi)
        return lat_ok & lng_ok

    def contains_rect(self, o: "S2LatLngRect") -> bool:
        return self.lat.contains_interval(o.lat) and self.lng.contains(o.lng)

    def interior_contains_rect(self, o: "S2LatLngRect") -> bool:
        return (self.lat.interior_contains_interval(o.lat)
                and self.lng.interior_contains(o.lng))

    def intersects(self, o: "S2LatLngRect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    def interior_intersects(self, o: "S2LatLngRect") -> bool:
        return (self.lat.interior_intersects(o.lat)
                and self.lng.interior_intersects(o.lng))

    def add_point(self, lat: float, lng: float) -> None:
        self.lat.add_point(lat)
        self.lng.add_point(lng)

    # -- geodesic-edge boundary predicates (latlng_rect.rs:342-371,
    #    515-559 — the reference's SIMPLIFIED linear-interpolation
    #    variants, reproduced verbatim including the 1e-10 degenerate
    #    guard and the non-wrapping lng interpolation) ------------------

    @staticmethod
    def intersects_lng_edge(a_xyz, b_xyz, lat: "R1Interval",
                            lng: float) -> bool:
        """Edge AB vs the meridian segment at ``lng`` within ``lat``
        (latlng_rect.rs:515-535)."""
        lat_a = float(ll.xyz_to_lat(*a_xyz))
        lat_b = float(ll.xyz_to_lat(*b_xyz))
        lng_a = float(ll.xyz_to_lng(*a_xyz))
        lng_b = float(ll.xyz_to_lng(*b_xyz))
        if (lng_a <= lng <= lng_b) or (lng_a >= lng >= lng_b):
            if abs(lng_b - lng_a) < 1e-10:
                t = 0.5
            else:
                t = (lng - lng_a) / (lng_b - lng_a)
            return lat.contains(lat_a + t * (lat_b - lat_a))
        return False

    @staticmethod
    def intersects_lat_edge(a_xyz, b_xyz, lat: float,
                            lng: "S1Interval") -> bool:
        """Edge AB vs the parallel segment at ``lat`` within ``lng``
        (latlng_rect.rs:538-558)."""
        lat_a = float(ll.xyz_to_lat(*a_xyz))
        lat_b = float(ll.xyz_to_lat(*b_xyz))
        lng_a = float(ll.xyz_to_lng(*a_xyz))
        lng_b = float(ll.xyz_to_lng(*b_xyz))
        if (lat_a <= lat <= lat_b) or (lat_a >= lat >= lat_b):
            if abs(lat_b - lat_a) < 1e-10:
                t = 0.5
            else:
                t = (lat - lat_a) / (lat_b - lat_a)
            return lng.contains_point(lng_a + t * (lng_b - lng_a))
        return False

    def boundary_intersects(self, a_xyz, b_xyz) -> bool:
        """Does edge AB cross this rect's boundary
        (latlng_rect.rs:342-371)."""
        if self.is_empty():
            return False
        if not self.lng.is_full():
            if self.intersects_lng_edge(a_xyz, b_xyz, self.lat, self.lng.lo):
                return True
            if self.intersects_lng_edge(a_xyz, b_xyz, self.lat, self.lng.hi):
                return True
        if self.lat.lo != -PI_2 and self.intersects_lat_edge(
                a_xyz, b_xyz, self.lat.lo, self.lng):
            return True
        if self.lat.hi != PI_2 and self.intersects_lat_edge(
                a_xyz, b_xyz, self.lat.hi, self.lng):
            return True
        return False

    def expanded(self, lat_margin: float, lng_margin: float) -> "S2LatLngRect":
        """latlng_rect.rs:388-406."""
        if self.is_empty():
            return S2LatLngRect(R1Interval(self.lat.lo, self.lat.hi),
                                S1Interval(self.lng.lo, self.lng.hi))
        exp_lat = R1Interval(max(self.lat.lo - lat_margin, -PI_2),
                             min(self.lat.hi + lat_margin, PI_2))
        exp_lng = self.lng.expanded(lng_margin)
        return S2LatLngRect(exp_lat, exp_lng)

    def get_vertex(self, k: int):
        """latlng_rect.rs:235-244: (lat, lng) vertices in CCW order —
        bit-twiddled i = (k>>1)&1, j = i ^ (k&1)."""
        i = (k >> 1) & 1
        j = i ^ (k & 1)
        return (self.lat.hi if i else self.lat.lo,
                self.lng.hi if j else self.lng.lo)

    def expanded_by_distance(self, distance_radians: float) -> "S2LatLngRect":
        """latlng_rect.rs:439-458 (simplified spherical margins): lat
        margin = distance; lng margin = distance / |cos(avg lat)|, or a
        full 2*pi sweep near the poles."""
        import math as _m

        lat_margin = distance_radians
        avg_lat = self.lat.get_center()
        c = abs(_m.cos(avg_lat))
        lng_margin = distance_radians / c if c > 1e-10 else 2.0 * PI
        return self.expanded(lat_margin, lng_margin)

    def get_distance(self, o: "S2LatLngRect") -> float:
        """latlng_rect.rs:461-481 (simplified): zero when the rects
        intersect, else the min haversine distance over the 4x4 corner
        pairs."""
        from . import latlng as ll

        if self.intersects(o):
            return 0.0
        best = float("inf")
        for i in range(4):
            for j in range(4):
                a_lat, a_lng = self.get_vertex(i)
                b_lat, b_lng = o.get_vertex(j)
                best = min(best, float(
                    ll.haversine_distance(a_lat, a_lng, b_lat, b_lng)))
        return best

    def polar_closure(self) -> "S2LatLngRect":
        """latlng_rect.rs:408-418: a rect touching either pole expands
        its longitude span to full (all representations of a contained
        pole are then contained)."""
        if self.lat.lo == -PI_2 or self.lat.hi == PI_2:
            return S2LatLngRect(R1Interval(self.lat.lo, self.lat.hi),
                                S1Interval.full())
        return self

    def get_distance_to_point(self, lat: float, lng: float) -> float:
        """latlng_rect.rs:484-496 (simplified projection semantics):
        zero when contained, else the haversine distance to the
        (lat-project, lng-project) corner point."""
        from . import latlng as ll

        if self.contains_latlng(lat, lng):
            return 0.0
        lat_proj = self.lat.project(lat)
        lng_proj = self.lng.project(lng)
        return float(ll.haversine_distance(lat, lng, lat_proj, lng_proj))

    def union(self, o: "S2LatLngRect") -> "S2LatLngRect":
        return S2LatLngRect(self.lat.union(o.lat), self.lng.union(o.lng))

    def intersection(self, o: "S2LatLngRect") -> "S2LatLngRect":
        return S2LatLngRect(self.lat.intersection(o.lat),
                            self.lng.intersection(o.lng))

    def get_center(self):
        return self.lat.get_center(), self.lng.get_center()

    def get_size(self):
        return self.lat.get_length(), self.lng.get_length()

    def area(self) -> float:
        if self.is_empty():
            return 0.0
        return self.lng.get_length() * (math.sin(self.lat.hi) - math.sin(self.lat.lo))

    def get_vertex(self, k: int):
        """CCW vertices (latlng_rect.rs:237-244)."""
        i = (k >> 1) & 1
        j = i ^ (k & 1)
        lat = self.lat.lo if i == 0 else self.lat.hi
        lng = self.lng.lo if j == 0 else self.lng.hi
        return lat, lng

    def approx_equals(self, o: "S2LatLngRect", max_error: float) -> bool:
        return (self.lat.approx_equals(o.lat, max_error)
                and self.lng.approx_equals(o.lng, max_error))

    def get_cap_bound(self):
        """Center + max-corner-distance cap (region_coverer.rs:96-124
        version used for covering rects). Returns (center_xyz, radius_l2)."""
        from . import chord
        center_lat = (self.lat.lo + self.lat.hi) / 2.0
        center_lng = self.lng.get_center()
        cx, cy, cz = ll.latlng_to_xyz(center_lat, center_lng)
        max_l2 = 0.0
        for la, ln in ((self.lat.lo, self.lng.lo), (self.lat.lo, self.lng.hi),
                       (self.lat.hi, self.lng.lo), (self.lat.hi, self.lng.hi)):
            px, py, pz = ll.latlng_to_xyz(la, ln)
            l2 = float(chord.between_points(cx, cy, cz, px, py, pz))
            max_l2 = max(max_l2, l2)
        return (float(cx), float(cy), float(cz)), max_l2
