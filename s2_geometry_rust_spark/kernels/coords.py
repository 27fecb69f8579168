"""Canonical S2 coordinate transforms (the math.rs quadratic path).

Mirrors ``/root/reference/src/math.rs`` ``coords`` module: quadratic
ST<->UV projection, discrete IJ / SiTi grids, face UVW axes & neighbor
tables.  NOTE this is a *different* coordinate path from the linear one
used by the cell-id kernel (see ``kernels.cellid``); the reference keeps
both and its tests exercise both (SURVEY.md §8.1).
"""

from __future__ import annotations

import numpy as np

MAX_CELL_LEVEL = 30
LIMIT_IJ = 1 << MAX_CELL_LEVEL          # 2^30
MAX_SI_TI = np.uint32(1) << np.uint32(MAX_CELL_LEVEL + 1)  # 2^31
MAX_XYZ_TO_UV_ERROR = 0.5 * np.finfo(np.float64).eps
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# Hilbert traversal tables (math.rs:81-99)
IJ_TO_POS = np.array([
    [0, 1, 3, 2],
    [0, 3, 1, 2],
    [2, 3, 1, 0],
    [2, 1, 3, 0],
], dtype=np.int32)
POS_TO_IJ = np.array([
    [0, 1, 3, 2],
    [0, 2, 3, 1],
    [3, 2, 0, 1],
    [3, 1, 0, 2],
], dtype=np.int32)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK],
                              dtype=np.int32)

# Face UVW axes (math.rs:103-110): FACE_UVW_AXES[face][axis] = xyz
FACE_UVW_AXES = np.array([
    [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
    [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
    [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
    [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
    [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
    [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
], dtype=np.float64)

# Face neighbor table (math.rs:114-121)
FACE_UVW_FACES = np.array([
    [[4, 1], [5, 2], [3, 0]],
    [[0, 3], [5, 2], [4, 1]],
    [[0, 3], [1, 4], [5, 2]],
    [[2, 5], [1, 4], [0, 3]],
    [[2, 5], [3, 0], [1, 4]],
    [[4, 1], [3, 0], [2, 5]],
], dtype=np.int32)


def st_to_uv(s):
    """Quadratic projection (math.rs:126-137)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def uv_to_st(u):
    """Inverse quadratic projection (math.rs:142-153)."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(u >= 0.0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def ij_to_st_min(i):
    return np.asarray(i, dtype=np.float64) / float(LIMIT_IJ)


def st_to_ij(s):
    """Truncating cast then clamp (math.rs:166-170)."""
    r = (float(LIMIT_IJ) * np.asarray(s, dtype=np.float64)).astype(np.int64)
    return np.clip(r, 0, LIMIT_IJ - 1).astype(np.int32)


def si_ti_to_st(si):
    return np.asarray(si, dtype=np.float64) / float(MAX_SI_TI)


def st_to_si_ti(s):
    """Round-half-up via +0.5 truncation (math.rs:183-186)."""
    return ((np.asarray(s, dtype=np.float64) * float(MAX_SI_TI)) + 0.5).astype(np.uint32)


def face_uv_to_xyz(f, u, v):
    """math.rs:191-201 face table (no normalization)."""
    f = np.asarray(f, dtype=np.int32)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    sel = [f == k for k in range(6)]
    x = np.select(sel, [one, -u, -u, -one, v, v])
    y = np.select(sel, [u, one, -v, -v, -one, u])
    z = np.select(sel, [v, v, one, -u, -u, -one])
    return x, y, z


def get_face(x, y, z):
    """Largest-component face selection (math.rs:206-221)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where((ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    return np.where(comp < 0.0, axis + 3, axis).astype(np.int32)


def valid_face_xyz_to_uv(f, x, y, z):
    """math.rs:235-246."""
    f = np.asarray(f, dtype=np.int32)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    sel = [f == k for k in range(6)]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(sel, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(sel, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return u, v


def xyz_to_face_uv(x, y, z):
    f = get_face(x, y, z)
    u, v = valid_face_xyz_to_uv(f, x, y, z)
    return f, u, v


def xyz_to_face_si_ti(x, y, z):
    """math.rs:283-298: xyz -> (face, si, ti, level)."""
    f, u, v = xyz_to_face_uv(x, y, z)
    s = uv_to_st(u)
    t = uv_to_st(v)
    si = st_to_si_ti(s)
    ti = st_to_si_ti(t)
    return f, si, ti, compute_cell_level(si, ti)


def face_si_ti_to_xyz(f, si, ti):
    s = si_ti_to_st(si)
    t = si_ti_to_st(ti)
    return face_uv_to_xyz(f, st_to_uv(s), st_to_uv(t))


def compute_cell_level(si, ti):
    """Cell-center level detection (math.rs:312-344); -1 if not a center."""
    si = np.asarray(si, dtype=np.uint32)
    ti = np.asarray(ti, dtype=np.uint32)

    def _tz(v):
        lb = v & (~v + np.uint32(1))
        return np.log2(np.maximum(lb, np.uint32(1)).astype(np.float64)).astype(np.int32)

    si_tz = _tz(si)
    ti_tz = _tz(ti)
    lv = MAX_CELL_LEVEL - si_tz
    si_shift = si >> si_tz.astype(np.uint32)
    ti_shift = ti >> ti_tz.astype(np.uint32)
    bad = ((si == 0) | (ti == 0) | (si == MAX_SI_TI) | (ti == MAX_SI_TI)
           | (si_tz != ti_tz) | (lv < 0) | (lv > MAX_CELL_LEVEL)
           | ((si_shift & np.uint32(1)) != 1) | ((ti_shift & np.uint32(1)) != 1))
    return np.where(bad, -1, lv).astype(np.int32)


def get_u_norm(f, u):
    """math.rs:349-358 (unnormalized edge normals)."""
    f = np.asarray(f, dtype=np.int32)
    u = np.asarray(u, dtype=np.float64)
    one = np.ones_like(u)
    zero = np.zeros_like(u)
    sel = [f == k for k in range(6)]
    x = np.select(sel, [u, one, one, -u, zero, zero])
    y = np.select(sel, [-one, u, zero, zero, -u, -one])
    z = np.select(sel, [zero, zero, u, one, one, -u])
    return x, y, z


def get_v_norm(f, v):
    """math.rs:364-373."""
    f = np.asarray(f, dtype=np.int32)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(v)
    zero = np.zeros_like(v)
    sel = [f == k for k in range(6)]
    x = np.select(sel, [-v, zero, zero, v, one, one])
    y = np.select(sel, [zero, -v, -one, -one, v, zero])
    z = np.select(sel, [one, one, -v, zero, zero, v])
    return x, y, z


def get_uvw_axis(f: int, axis: int) -> np.ndarray:
    return FACE_UVW_AXES[f][axis]


def get_norm(f: int) -> np.ndarray:
    return get_uvw_axis(f, 2)


def get_u_axis(f: int) -> np.ndarray:
    return get_uvw_axis(f, 0)


def get_v_axis(f: int) -> np.ndarray:
    return get_uvw_axis(f, 1)


def get_uvw_face(f: int, axis: int, direction: int) -> int:
    return int(FACE_UVW_FACES[f][axis][direction])


def swap_axes(ij):
    ij = np.asarray(ij, dtype=np.int32)
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def invert_bits(ij):
    return np.asarray(ij, dtype=np.int32) ^ 3


def face_xyz_to_uvw(face: int, x, y, z):
    """Transform xyz to the (u, v, w) frame of ``face`` — dots with the
    face's u/v/norm axes (math.rs:264-279)."""
    import numpy as np

    p = np.stack([np.asarray(x, dtype=np.float64),
                  np.asarray(y, dtype=np.float64),
                  np.asarray(z, dtype=np.float64)], axis=-1)
    return (p @ get_u_axis(face), p @ get_v_axis(face), p @ get_norm(face))


def is_unit_length(x: float, y: float, z: float) -> bool:
    """point.rs:139-143: |length2 - 1| <= 1e-15."""
    return abs((x * x + y * y + z * z) - 1.0) <= 1e-15


def approx_zero(v: float) -> bool:
    """math.rs:559-562 (EPSILON = f64::EPSILON)."""
    import numpy as np

    return abs(v) < float(np.finfo(np.float64).eps)
