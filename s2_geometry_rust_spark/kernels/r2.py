"""R2Point / R2Rect kernels (mirror of /root/reference/src/r2.rs).

Planar UV-space types backing S2Cell geometry.  Points are (x, y)
floats; rects compose two R1Intervals.  Kept scalar — these are
driver-side helpers; the hot-path UV math in cells/cells_true is raw
numpy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .intervals import R1Interval


@dataclass(frozen=True)
class R2Point:
    x: float
    y: float

    def dot_prod(self, o: "R2Point") -> float:
        return self.x * o.x + self.y * o.y

    def cross_prod(self, o: "R2Point") -> float:
        return self.x * o.y - self.y * o.x

    def ortho(self) -> "R2Point":
        """90-degree CCW rotation (r2.rs:75-78)."""
        return R2Point(-self.y, self.x)

    def distance_squared(self, o: "R2Point") -> float:
        dx, dy = self.x - o.x, self.y - o.y
        return dx * dx + dy * dy

    def distance(self, o: "R2Point") -> float:
        return math.sqrt(self.distance_squared(o))

    def norm(self) -> float:
        return math.sqrt(self.x * self.x + self.y * self.y)

    def __add__(self, o: "R2Point") -> "R2Point":
        return R2Point(self.x + o.x, self.y + o.y)

    def __sub__(self, o: "R2Point") -> "R2Point":
        return R2Point(self.x - o.x, self.y - o.y)

    def __mul__(self, k: float) -> "R2Point":
        return R2Point(self.x * k, self.y * k)


@dataclass
class R2Rect:
    x: R1Interval
    y: R1Interval

    @staticmethod
    def empty() -> "R2Rect":
        return R2Rect(R1Interval.empty(), R1Interval.empty())

    @staticmethod
    def from_points(lo: R2Point, hi: R2Point) -> "R2Rect":
        return R2Rect(R1Interval(lo.x, hi.x), R1Interval(lo.y, hi.y))

    @staticmethod
    def from_point_pair(p1: R2Point, p2: R2Point) -> "R2Rect":
        return R2Rect(
            R1Interval(min(p1.x, p2.x), max(p1.x, p2.x)),
            R1Interval(min(p1.y, p2.y), max(p1.y, p2.y)),
        )

    @staticmethod
    def from_center_size(center: R2Point, size: R2Point) -> "R2Rect":
        return R2Rect(
            R1Interval(center.x - 0.5 * size.x, center.x + 0.5 * size.x),
            R1Interval(center.y - 0.5 * size.y, center.y + 0.5 * size.y),
        )

    def is_empty(self) -> bool:
        return self.x.is_empty() or self.y.is_empty()

    def is_valid(self) -> bool:
        """r2.rs:251-254: both empty or both non-empty."""
        return self.x.is_empty() == self.y.is_empty()

    def get_vertex(self, k: int) -> R2Point:
        """CCW order starting from lower-left (r2.rs:263-268)."""
        k &= 3
        return R2Point(
            self.x.hi if k in (1, 2) else self.x.lo,
            self.y.hi if k in (2, 3) else self.y.lo,
        )

    def get_vertex_ij(self, i: int, j: int) -> R2Point:
        """r2.rs:270-278: i = left/right, j = bottom/top."""
        return R2Point(self.x.hi if i else self.x.lo,
                       self.y.hi if j else self.y.lo)

    def expanded_by_margin(self, margin: float) -> "R2Rect":
        """r2.rs:356-360."""
        return self.expanded(R2Point(margin, margin))

    def get_center(self) -> R2Point:
        return R2Point(self.x.get_center(), self.y.get_center())

    def get_size(self) -> R2Point:
        return R2Point(self.x.get_length(), self.y.get_length())

    def contains(self, p: R2Point) -> bool:
        return self.x.contains(p.x) and self.y.contains(p.y)

    def interior_contains(self, p: R2Point) -> bool:
        return self.x.interior_contains(p.x) and self.y.interior_contains(p.y)

    def contains_rect(self, o: "R2Rect") -> bool:
        return self.x.contains_interval(o.x) and self.y.contains_interval(o.y)

    def intersects(self, o: "R2Rect") -> bool:
        return self.x.intersects(o.x) and self.y.intersects(o.y)

    def add_point(self, p: R2Point) -> None:
        self.x.add_point(p.x)
        self.y.add_point(p.y)

    def project(self, p: R2Point) -> R2Point:
        return R2Point(self.x.project(p.x), self.y.project(p.y))

    def expanded(self, margin: R2Point) -> "R2Rect":
        xx = self.x.expanded(margin.x)
        yy = self.y.expanded(margin.y)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)

    def union(self, o: "R2Rect") -> "R2Rect":
        return R2Rect(self.x.union(o.x), self.y.union(o.y))

    def intersection(self, o: "R2Rect") -> "R2Rect":
        xx = self.x.intersection(o.x)
        yy = self.y.intersection(o.y)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)

    def approx_equals(self, o: "R2Rect", max_error: float = 1e-15) -> bool:
        return self.x.approx_equals(o.x, max_error) and self.y.approx_equals(
            o.y, max_error
        )
