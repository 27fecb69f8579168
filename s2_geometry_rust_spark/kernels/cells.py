"""S2Cell geometry (mirrors /root/reference/src/cell.rs).

Reference quirks reproduced (SURVEY.md §8.2):
- UV bounds of non-face cells are pinned to the face's lower-left corner
  with only the size depending on level (cell.rs:356-372);
- orientation is always 0 (cell.rs:350-354);
- ``face_uv_to_xyz`` / ``xyz_to_face_uv`` are cell.rs's own variants,
  which differ from both math.rs and cell_id.rs on some faces;
- ``exact_area`` is avg-edge-squared (cell.rs:441-455);
- ``contains(point)`` does NOT check the point is on the cell's
  hemisphere (cell.rs:270-277 divides blindly).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import cellid as ci

EPS = float(np.finfo(np.float64).eps)


def _cell_face_uv_to_xyz(face: int, u, v):
    """cell.rs:374-391 (returns UNNORMALIZED coords)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    table = {
        0: (one, u, v),
        1: (-u, one, v),
        2: (-u, -v, one),
        3: (-one, -v, -u),
        4: (v, -one, -u),
        5: (v, u, -one),
    }
    x, y, z = table.get(face, (one, np.zeros_like(u), np.zeros_like(u)))
    return x, y, z


def _cell_xyz_to_face_uv(face: int, x, y, z):
    """cell.rs:393-406 (no hemisphere validity check)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if face == 0:
            return y / x, z / x
        if face == 1:
            return -x / y, z / y
        if face == 2:
            return -x / z, -y / z
        if face == 3:
            return z / (-x), -y / (-x)
        if face == 4:
            return z / (-y), -x / (-y)
        if face == 5:
            return -y / (-z), x / (-z)
    raise ValueError(f"invalid face {face}")


def _point_normalize(x, y, z):
    """S2Point::normalize (point.rs:95-105): no-op when already ~unit."""
    length = np.sqrt(x * x + y * y + z * z)
    near_one = np.abs(length - 1.0) < EPS
    safe = np.where(length > 0.0, length, 1.0)
    return (np.where(near_one, x, x / safe),
            np.where(near_one, y, y / safe),
            np.where(near_one, z, z / safe))


@dataclass
class S2Cell:
    """Geometric cell; constructed from a (valid) uint64 cell id."""

    id: int
    face: int = field(init=False)
    level: int = field(init=False)
    orientation: int = field(init=False, default=0)
    u_lo: float = field(init=False)
    u_hi: float = field(init=False)
    v_lo: float = field(init=False)
    v_hi: float = field(init=False)

    def __post_init__(self):
        uid = np.uint64(self.id)
        self.face = int(ci.face(uid))
        self.level = int(ci.level(uid))
        # compute_uv_bounds quirk (cell.rs:356-372)
        if self.level == 0:
            self.u_lo, self.u_hi = -1.0, 1.0
            self.v_lo, self.v_hi = -1.0, 1.0
        else:
            size = 2.0 / float(1 << self.level)
            self.u_lo, self.u_hi = -1.0, -1.0 + size
            self.v_lo, self.v_hi = -1.0, -1.0 + size

    # -- vertices / edges ------------------------------------------------

    def _uv_vertex(self, k: int):
        """R2Rect::get_vertex CCW order: ll, lr, ur, ul."""
        k = ((k % 4) + 4) % 4
        u = self.u_lo if k in (0, 3) else self.u_hi
        v = self.v_lo if k in (0, 1) else self.v_hi
        return u, v

    def get_vertex_raw(self, k: int):
        u, v = self._uv_vertex(k)
        return _cell_face_uv_to_xyz(self.face, u, v)

    def get_vertex(self, k: int):
        x, y, z = self.get_vertex_raw(k)
        return _point_normalize(x, y, z)

    def get_edge_raw(self, k: int):
        """Inward edge normals (cell.rs:170-177)."""
        k = k & 3
        if k == 0:
            return _get_v_norm_cell(self.face, self.v_lo)
        if k == 1:
            return _get_u_norm_cell(self.face, self.u_hi)
        if k == 2:
            x, y, z = _get_v_norm_cell(self.face, self.v_hi)
            return -x, -y, -z
        x, y, z = _get_u_norm_cell(self.face, self.u_lo)
        return -x, -y, -z

    def get_bound_uv(self):
        """cell.rs:131-135: the (pinned-quirk) UV bounds as R2Rect."""
        from .r2 import R2Point, R2Rect

        return R2Rect.from_points(R2Point(self.u_lo, self.v_lo),
                                  R2Point(self.u_hi, self.v_hi))

    def get_uv_coord_of_edge(self, k: int) -> float:
        """cell.rs:180-190: the constant coordinate of edge k (even
        edges constant in V, odd edges constant in U)."""
        k = k & 3
        u, v = self._uv_vertex(k)
        return v if k % 2 == 0 else u

    def get_center(self):
        x, y, z = ci.to_point_raw(np.uint64(self.id))
        return _point_normalize(float(x), float(y), float(z))

    # -- areas -------------------------------------------------------------

    @staticmethod
    def average_area_at_level(level: int) -> float:
        return (2.0 * math.pi / 3.0) / float(1 << (2 * level))

    def get_average_area(self) -> float:
        return self.average_area_at_level(self.level)

    def approx_area(self) -> float:
        """UV-area scaled approximation (cell.rs:242-248)."""
        uv_area = (self.u_hi - self.u_lo) * (self.v_hi - self.v_lo)
        uv_at_level = 4.0 / float(1 << (2 * self.level))
        return uv_area * self.average_area_at_level(self.level) / uv_at_level

    def exact_area(self) -> float:
        """avg-edge^2 rough formula (cell.rs:253-262, 441-455)."""
        verts = [self.get_vertex(k) for k in range(4)]
        total = 0.0
        for i in range(4):
            a = verts[i]
            b = verts[(i + 1) % 4]
            cx, cy, cz = (a[1] * b[2] - a[2] * b[1],
                          a[2] * b[0] - a[0] * b[2],
                          a[0] * b[1] - a[1] * b[0])
            cross_len = math.sqrt(float(cx * cx + cy * cy + cz * cz))
            dot = float(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])
            total += math.atan2(cross_len, dot)
        avg_edge = total / 4.0
        return avg_edge * avg_edge

    # -- containment --------------------------------------------------------

    def contains_point(self, x, y, z):
        """Vectorized cell-contains-point (cell.rs:270-277): project to
        this face's UV (no hemisphere check) and test the UV rect."""
        u, v = _cell_xyz_to_face_uv(self.face, x, y, z)
        return ((u >= self.u_lo) & (u <= self.u_hi)
                & (v >= self.v_lo) & (v <= self.v_hi))

    def contains_cell(self, other: "S2Cell") -> bool:
        if self.level >= other.level:
            return False
        return int(ci.parent(np.uint64(other.id), self.level)) == self.id

    # -- point distances (cell.rs:300-345, nearest-vertex simplified) -------

    def get_boundary_distance(self, x, y, z):
        """Squared-chord distance from the cell BOUNDARY to each point
        (cell.rs:314-326): min over the 4 edges of the reference's
        simplified per-edge distance min(chord(p, a), chord(p, b)) —
        which reduces to the min over the 4 vertices."""
        from . import chord

        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        best = np.full(np.shape(x), chord.INFINITY)
        for k in range(4):
            vx, vy, vz = self.get_vertex(k)
            best = np.minimum(
                best, chord.between_points(x, y, z, vx, vy, vz)
            )
        return best

    def get_distance_to_point(self, x, y, z):
        """Squared-chord distance cell -> point (cell.rs:304-310): zero
        when the point is contained, else the boundary distance."""
        inside = self.contains_point(x, y, z)
        return np.where(
            inside, 0.0, self.get_boundary_distance(x, y, z)
        )

    def get_max_distance(self, x, y, z):
        """Max squared-chord distance cell -> point (cell.rs:329-345):
        straight (4.0) when the ANTIPODAL point is contained, else the
        max over the 4 vertices."""
        from . import chord

        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        worst = np.full(np.shape(x), chord.NEGATIVE)
        for k in range(4):
            vx, vy, vz = self.get_vertex(k)
            worst = np.maximum(
                worst, chord.between_points(x, y, z, vx, vy, vz)
            )
        anti = self.contains_point(-x, -y, -z)
        return np.where(anti, chord.STRAIGHT, worst)

    def may_intersect(self, other: "S2Cell") -> bool:
        return bool(ci.intersects(np.uint64(self.id), np.uint64(other.id)))

    # -- bounds --------------------------------------------------------------

    def get_cap_bound(self):
        """(center, radius_radians) per cell.rs:473-487."""
        cx, cy, cz = self.get_center()
        max_d2 = 0.0
        for k in range(4):
            vx, vy, vz = self.get_vertex(k)
            d2 = float((cx - vx) ** 2 + (cy - vy) ** 2 + (cz - vz) ** 2)
            max_d2 = max(max_d2, d2)
        # Reference computes asin(sqrt(d2)) with NO clamp (cell.rs:485);
        # arguments > 1 yield NaN there too — reproduce via np.arcsin.
        with np.errstate(invalid="ignore"):
            radius = float(np.arcsin(np.sqrt(max_d2)))
        return (float(cx), float(cy), float(cz)), radius

    def get_rect_bound(self):
        """Vertex-only rect bound (cell.rs:490-501). Returns an
        rects.S2LatLngRect."""
        from . import latlng as ll
        from .rects import S2LatLngRect
        rect = S2LatLngRect.empty()
        for k in range(4):
            vx, vy, vz = self.get_vertex(k)
            rect.add_point(float(ll.xyz_to_lat(vx, vy, vz)),
                           float(ll.xyz_to_lng(vx, vy, vz)))
        return rect


def _get_u_norm_cell(face: int, u: float):
    """cell.rs:408-419."""
    return {
        0: (u, -1.0, 0.0), 1: (1.0, u, 0.0), 2: (1.0, 0.0, u),
        3: (-u, 0.0, 1.0), 4: (0.0, -u, 1.0), 5: (0.0, -1.0, -u),
    }[face]


def _get_v_norm_cell(face: int, v: float):
    """cell.rs:422-432."""
    return {
        0: (-v, 0.0, 1.0), 1: (0.0, -v, 1.0), 2: (0.0, -1.0, -v),
        3: (v, -1.0, 0.0), 4: (1.0, v, 0.0), 5: (1.0, 0.0, v),
    }[face]
