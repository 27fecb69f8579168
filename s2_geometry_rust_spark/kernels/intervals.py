"""1-D intervals: R1 (linear) and S1 (circular with wraparound).

Mirrors ``/root/reference/src/interval.rs``.  These are small value
classes used inside per-region UDFs (coverings, rect algebra); the
hot-path containment predicates also have vectorized counterparts in
``kernels.rects``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

PI = math.pi


def ieee_remainder(x: float, y: float) -> float:
    return math.remainder(x, y)


def positive_distance(a: float, b: float) -> float:
    """Distance from a to b CCW, in [0, 2pi) (interval.rs:545-553)."""
    d = b - a
    if d >= 0.0:
        return d
    return (b + PI) - (a - PI)


@dataclass
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(p1, p2) if p1 <= p2 else R1Interval(p2, p1)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return o.lo > self.lo and o.hi < self.hi

    def intersects(self, o: "R1Interval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def interior_intersects(self, o: "R1Interval") -> bool:
        return (o.lo < self.hi and self.lo < o.hi
                and self.lo < self.hi and o.lo <= o.hi)

    def add_point(self, p: float) -> None:
        if self.is_empty():
            self.lo = p
            self.hi = p
        elif p < self.lo:
            self.lo = p
        elif p > self.hi:
            self.hi = p

    def add_interval(self, o: "R1Interval") -> None:
        if o.is_empty():
            return
        if self.is_empty():
            self.lo, self.hi = o.lo, o.hi
            return
        if o.lo < self.lo:
            self.lo = o.lo
        if o.hi > self.hi:
            self.hi = o.hi

    def project(self, p: float) -> float:
        return min(max(p, self.lo), self.hi)

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(self.lo - margin, self.hi + margin)

    def union(self, o: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return R1Interval(o.lo, o.hi)
        if o.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def intersection(self, o: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def get_directed_hausdorff_distance(self, o: "R1Interval") -> float:
        """interval.rs:750-758: 0 when self empty, inf when other
        empty, else max(0, hi-o.hi, o.lo-lo)."""
        if self.is_empty():
            return 0.0
        if o.is_empty():
            return float("inf")
        return max(0.0, max(self.hi - o.hi, o.lo - self.lo))

    def approx_equals(self, o: "R1Interval", max_error: float) -> bool:
        if self.is_empty():
            return o.get_length() <= 2.0 * max_error
        if o.is_empty():
            return self.get_length() <= 2.0 * max_error
        return (abs(self.lo - o.lo) <= max_error
                and abs(self.hi - o.hi) <= max_error)


@dataclass
class S1Interval:
    lo: float
    hi: float

    @staticmethod
    def new(lo: float, hi: float) -> "S1Interval":
        """Public constructor with -pi -> pi normalization
        (interval.rs:62-79).  NOTE: the reference tests the *original*
        lo in the second branch (bounds[0] is mutated but the check
        reads the untouched parameter), so new(-pi, -pi) -> [pi, pi]."""
        new_lo, new_hi = lo, hi
        if lo == -PI and hi != PI:
            new_lo = PI
        if hi == -PI and lo != PI:
            new_hi = PI
        return S1Interval(new_lo, new_hi)

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(PI, -PI)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-PI, PI)

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -PI:
            p = PI
        return S1Interval(p, p)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -PI:
            p1 = PI
        if p2 == -PI:
            p2 = PI
        if positive_distance(p1, p2) <= PI:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + PI if center <= 0.0 else center - PI

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0.0:
            return length
        length += 2.0 * PI
        return length if length > 0.0 else -1.0

    def complement(self) -> "S1Interval":
        if self.lo == self.hi:
            return S1Interval.full()
        return S1Interval(self.hi, self.lo)

    def get_complement_center(self) -> float:
        if self.lo != self.hi:
            return self.complement().get_center()
        return self.hi + PI if self.hi <= 0.0 else self.hi - PI

    def get_directed_hausdorff_distance(self, o: "S1Interval") -> float:
        """interval.rs:473-502: 0 when o contains self (incl. empty
        self), pi when o empty; otherwise realized either from o.hi to
        o's complement center (when self contains that center) or by
        the hi/hi and lo/lo endpoint pairs."""
        if o.contains(self):
            return 0.0
        if o.is_empty():
            return PI
        occ = o.get_complement_center()
        if self.contains_point(occ):
            return positive_distance(o.hi, occ)
        hi_hi = (positive_distance(o.hi, self.hi)
                 if S1Interval(o.hi, occ).contains_point(self.hi)
                 else 0.0)
        lo_lo = (positive_distance(self.lo, o.lo)
                 if S1Interval(occ, o.lo).contains_point(self.lo)
                 else 0.0)
        return max(hi_hi, lo_lo)

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains_point(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self.fast_contains(p)

    def interior_contains_point(self, p: float) -> bool:
        if p == -PI:
            p = PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if not o.is_inverted():
                return o.lo > self.lo or o.hi < self.hi
            return (o.lo > self.lo and o.hi < self.hi) or o.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return (o.lo > self.lo and o.hi < self.hi) or self.is_full()

    def intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def interior_intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo < self.hi or o.hi > self.lo
        if o.is_inverted():
            return o.lo < self.hi or o.hi > self.lo
        return (o.lo < self.hi and o.hi > self.lo) or self.is_full()

    def union(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return S1Interval(self.lo, self.hi)
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if self.contains(o):
                    return S1Interval(self.lo, self.hi)
                return S1Interval.full()
            return S1Interval(self.lo, o.hi)
        if self.fast_contains(o.hi):
            return S1Interval(o.lo, self.hi)
        if self.is_empty() or o.fast_contains(self.lo):
            return S1Interval(o.lo, o.hi)
        dlo = positive_distance(o.hi, self.lo)
        dhi = positive_distance(self.hi, o.lo)
        if dlo < dhi:
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)

    def intersection(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return S1Interval.empty()
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if o.get_length() < self.get_length():
                    return S1Interval(o.lo, o.hi)
                return S1Interval(self.lo, self.hi)
            return S1Interval(o.lo, self.hi)
        if self.fast_contains(o.hi):
            return S1Interval(self.lo, o.hi)
        if o.fast_contains(self.lo):
            return S1Interval(self.lo, self.hi)
        return S1Interval.empty()

    def add_point(self, p: float) -> None:
        if p == -PI:
            p = PI
        if self.fast_contains(p):
            return
        if self.is_empty():
            self.lo = p
            self.hi = p
            return
        dlo = positive_distance(p, self.lo)
        dhi = positive_distance(self.hi, p)
        if dlo < dhi:
            self.lo = p
        else:
            self.hi = p

    def project(self, p: float) -> float:
        if p == -PI:
            p = PI
        if self.fast_contains(p):
            return p
        dlo = positive_distance(p, self.lo)
        dhi = positive_distance(self.hi, p)
        return self.lo if dlo < dhi else self.hi

    def expanded(self, margin: float) -> "S1Interval":
        """interval.rs:419-458 (remainder-based re-wrap + the reference's
        asymmetric lo<=-pi normalization)."""
        if margin >= 0.0:
            if self.is_empty():
                return S1Interval(self.lo, self.hi)
            if self.get_length() + 2.0 * margin + 2.0 * 2.220446049250313e-16 >= 2.0 * PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return S1Interval(self.lo, self.hi)
            if self.get_length() + 2.0 * margin - 2.0 * 2.220446049250313e-16 <= 0.0:
                return S1Interval.empty()
        new_lo = ieee_remainder(self.lo - margin, 2.0 * PI)
        new_hi = ieee_remainder(self.hi + margin, 2.0 * PI)
        res = S1Interval(new_lo, new_hi)
        if res.lo <= -PI:
            res.lo = PI
        if res.hi == -PI and res.lo != PI:
            res.hi = PI
        return res

    def approx_equals(self, o: "S1Interval", max_error: float) -> bool:
        if self.is_empty():
            return o.get_length() <= 2.0 * max_error
        if o.is_empty():
            return self.get_length() <= 2.0 * max_error
        if self.is_full():
            return o.get_length() >= 2.0 * (PI - max_error)
        if o.is_full():
            return self.get_length() >= 2.0 * (PI - max_error)
        lo_diff = abs(ieee_remainder(o.lo - self.lo, 2.0 * PI))
        hi_diff = abs(ieee_remainder(o.hi - self.hi, 2.0 * PI))
        length_diff = abs(self.get_length() - o.get_length())
        return (lo_diff <= max_error and hi_diff <= max_error
                and length_diff <= 2.0 * max_error)
