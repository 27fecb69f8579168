"""Vectorized S2 cell-id math (the Hilbert core).

numpy-uint64 mirrors of the reference cell-id semantics
(``/root/reference/src/cell_id.rs``), including its documented
simplifications (SURVEY.md §8):

- the cell-id path uses a private *linear* ST<->UV mapping
  (cell_id.rs:542-557), not the quadratic projection in math.rs;
- ``xyz_to_face_uv`` / ``face_uv_to_xyz`` are the cell_id.rs private
  variants (cell_id.rs:507-572), which differ from math.rs on faces 2/4/5;
- cell centers come from an approximate (non-Hilbert-inverse)
  ``get_center_si_ti`` (cell_id.rs:439-480);
- ``append_all_neighbors`` is id-space +/- one step (cell_id.rs:696-722).

All ids are numpy ``uint64``.  At Spark column boundaries ids are
reinterpreted as signed int64 (two's complement); order-sensitive column
ops must XOR with 2^63 first (see ``functions.columns``).
"""

from __future__ import annotations

import numpy as np

from .hilbert import LOOKUP_POS, LOOKUP_BITS, SWAP_MASK, INVERT_MASK

U = np.uint64
MAX_LEVEL = 30
FACE_BITS = 3
NUM_FACES = 6
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # 2^30

_U0 = U(0)
_U1 = U(1)
_U2 = U(2)
_U3 = U(3)
_U61 = U(POS_BITS)
_VALID_LSB_MASK = U(0x1555555555555555)


def _u(a):
    return np.asarray(a, dtype=np.uint64)


# ---------------------------------------------------------------------------
# face / UV projection (cell_id.rs:507-572 private variants)
# ---------------------------------------------------------------------------

def xyz_to_face_uv(x, y, z):
    """Cube-face gnomonic projection; returns (face:int32, u, v).

    Mirrors cell_id.rs:507-537 (tie-breaking ``ax >= ay && ax >= az`` and
    the reference's per-face numerator/denominator choices).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)

    x_dom = (ax >= ay) & (ax >= az)
    y_dom = ~x_dom & (ay >= az)
    z_dom = ~x_dom & ~y_dom

    face = np.where(x_dom, np.where(x >= 0.0, 0, 3),
                    np.where(y_dom, np.where(y >= 0.0, 1, 4),
                             np.where(z >= 0.0, 2, 5))).astype(np.int32)

    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = face == 0
        u[m] = y[m] / x[m]
        v[m] = z[m] / x[m]
        m = face == 3
        u[m] = -z[m] / (-x[m])
        v[m] = -y[m] / (-x[m])
        m = face == 1
        u[m] = -x[m] / y[m]
        v[m] = z[m] / y[m]
        m = face == 4
        u[m] = z[m] / (-y[m])
        v[m] = x[m] / (-y[m])
        m = face == 2
        u[m] = -y[m] / z[m]
        v[m] = -x[m] / z[m]
        m = face == 5
        u[m] = -x[m] / (-z[m])
        v[m] = y[m] / (-z[m])
    return face, u, v


def face_uv_to_xyz(face, u, v):
    """Inverse projection, cell_id.rs private variant (cell_id.rs:562-572).

    NOTE: differs from the math.rs table on faces 2/4/5, and the reference
    normalizes the result (glam ``normalize`` = multiply by 1/length).
    """
    face = np.asarray(face, dtype=np.int32)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [one, -u, -v, -one, v, u])
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [u, one, -u, -v, -one, v])
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [v, v, one, -u, u, -one])
    inv_len = 1.0 / np.sqrt(x * x + y * y + z * z)
    return x * inv_len, y * inv_len, z * inv_len


def uv_to_st_linear(u):
    """UV [-1,1] -> integer ST [0, 2^30) — the *linear* simplification the
    cell-id path uses (cell_id.rs:542-548)."""
    s = 0.5 * (np.asarray(u, dtype=np.float64) + 1.0)
    scaled = s * float(MAX_SIZE)
    return np.clip(scaled, 0.0, float(MAX_SIZE - 1)).astype(np.uint32)


def st_to_uv_linear(s):
    """Integer ST -> UV (cell_id.rs:553-557)."""
    return (np.asarray(s, dtype=np.float64) / float(MAX_SIZE)) * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Hilbert encoding
# ---------------------------------------------------------------------------

def from_face_ij(face, i, j):
    """(face, i, j) -> leaf cell id via the 4-bit Hilbert lookup table,
    8 iterations (cell_id.rs:208-238)."""
    face = _u(face)
    # one uint32->uint64 widen up front instead of two astypes per
    # Hilbert round (16 full-array copies saved; shift/mask values are
    # identical in the wider lane)
    i = np.asarray(np.asarray(i, dtype=np.uint32), dtype=np.uint64)
    j = np.asarray(np.asarray(j, dtype=np.uint32), dtype=np.uint64)
    n = face << U(POS_BITS - 1)
    bits = face & U(SWAP_MASK)
    mask = U((1 << LOOKUP_BITS) - 1)
    lb = U(LOOKUP_BITS)
    for k in range(7, -1, -1):
        i_chunk = (i >> U(k * LOOKUP_BITS)) & mask
        j_chunk = (j >> U(k * LOOKUP_BITS)) & mask
        lookup_index = bits + (i_chunk << (lb + _U2)) + (j_chunk << _U2)
        r = LOOKUP_POS[lookup_index.astype(np.int64)]
        n = n | ((r >> _U2) << U(k * 2 * LOOKUP_BITS))
        bits = r & U(SWAP_MASK | INVERT_MASK)
    return n * _U2 + _U1


def from_face_uv(face, u, v):
    return from_face_ij(face, uv_to_st_linear(u), uv_to_st_linear(v))


def from_point(x, y, z):
    """Point -> leaf cell id (level 30), cell_id.rs:175-178."""
    face, u, v = xyz_to_face_uv(x, y, z)
    return from_face_uv(face, u, v)


# ---------------------------------------------------------------------------
# field extraction / hierarchy
# ---------------------------------------------------------------------------

def face(ids):
    return (_u(ids) >> _U61).astype(np.int32)


def lsb(ids):
    ids = _u(ids)
    with np.errstate(over="ignore"):  # two's-complement negate wraps at 0
        return ids & (~ids + _U1)


def level(ids):
    """level = 30 - tz(id)/2; id==0 -> -1 (cell_id.rs:267-272)."""
    ids = _u(ids)
    lb = lsb(ids)
    # log2 of an exact power of two in f64 is exact up to 2^63.
    tz = np.log2(np.maximum(lb, _U1).astype(np.float64)).astype(np.int64)
    lv = MAX_LEVEL - (tz >> 1)
    return np.where(ids == _U0, -1, lv).astype(np.int32)


def pos(ids):
    return _u(ids) & (U(0xFFFFFFFFFFFFFFFF) >> U(FACE_BITS))


def is_leaf(ids):
    return (_u(ids) & _U1) != _U0


def is_valid(ids):
    ids = _u(ids)
    return (face(ids) < NUM_FACES) & ((lsb(ids) & _VALID_LSB_MASK) != _U0)


def lsb_for_level(lv):
    return _u(_U1) << (_U2 * (U(MAX_LEVEL) - _u(lv)))


def immediate_parent(id_):
    """cell_id.rs:307-314: parent at level-1; level-0 cells have no
    parent (reference S2Error -> ValueError here)."""
    lv = int(level(U(int(id_))))
    if lv <= 0:
        raise ValueError("Cannot get parent of level 0 cell")
    return parent(U(int(id_)), lv - 1)


def parent(ids, lv):
    """Parent at the given level (caller guarantees lv <= level(id)),
    cell_id.rs:297-305."""
    new_lsb = lsb_for_level(lv)
    return (_u(ids) & (~new_lsb + _U1)) | new_lsb


def parent_at_level(ids, lv):
    """parent_at_level semantics of cell_id.rs:651-657: identity when the
    cell is already at or above the target level."""
    ids = _u(ids)
    cur = level(ids)
    p = parent(ids, lv)
    return np.where(cur <= lv, ids, p)


def child(ids, child_pos):
    """child(pos): id + (2*pos+1-4) * (lsb>>2)  (cell_id.rs:325-338)."""
    ids = _u(ids)
    new_lsb = lsb(ids) >> _U2
    with np.errstate(over="ignore"):  # intentional two's-complement wrap
        offset = (U(2) * _u(child_pos) + _U1) - U(4)
        return ids + offset * new_lsb


def children(ids):
    """Four children of each id, shape (n, 4)."""
    ids = _u(ids)
    return np.stack([child(ids, p) for p in range(4)], axis=-1)


def range_min(ids):
    return _u(ids) - (lsb(ids) - _U1)


def range_max(ids):
    return _u(ids) + (lsb(ids) - _U1)


def contains(a, b):
    """cell a contains cell b (cell_id.rs:355-357)."""
    b = _u(b)
    return (b >= range_min(a)) & (b <= range_max(a))


def intersects(a, b):
    return (range_min(a) <= range_max(b)) & (range_min(b) <= range_max(a))


def next_id(ids):
    return _u(ids) + (lsb(ids) << _U1)


def from_face_pos_level(f, p, lv):
    """cell_id.rs:155-169 — note the reference masks pos with ``!lsb``
    (bitwise NOT), not ``-lsb``."""
    lb = lsb_for_level(lv)
    return (_u(f) << U(POS_BITS)) | (_u(p) & ~lb) | lb


def from_face(f):
    return from_face_pos_level(f, 0, 0)


def begin(lv: int) -> int:
    return int(from_face_pos_level(0, 0, lv))


def end(lv: int) -> int:
    return int(next_id(from_face_pos_level(5, 0, lv)))


def maximum_tile(id_: int, end_: int) -> int:
    """Largest ancestor of ``id_`` whose range stays below ``end_``
    (cell_id.rs:673-685)."""
    cur = U(id_)
    while int(level(cur)) > 0:
        par = parent(cur, int(level(cur)) - 1)
        if int(range_max(par)) >= end_:
            break
        cur = par
    return int(cur)


# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------

def to_token(ids) -> np.ndarray:
    """Hex token, trailing zeros stripped; invalid (0) -> 'X'
    (cell_id.rs:369-383)."""
    ids = np.atleast_1d(_u(ids))
    out = np.empty(ids.shape, dtype=object)
    for idx, v in enumerate(ids):
        iv = int(v)
        if iv == 0:
            out[idx] = "X"
            continue
        h = f"{iv:016x}"
        h = h.rstrip("0")
        out[idx] = h if h else "0"
    return out


def from_token(tokens) -> np.ndarray:
    """Inverse of to_token (cell_id.rs:394-416); invalid tokens -> 0."""
    toks = np.atleast_1d(np.asarray(tokens, dtype=object))
    out = np.zeros(toks.shape, dtype=np.uint64)
    for idx, t in enumerate(toks):
        if t == "X" or t is None:
            out[idx] = 0
            continue
        padded = str(t).ljust(16, "0")
        try:
            v = int(padded, 16)
        except ValueError:
            out[idx] = 0
            continue
        out[idx] = v
    return out


# ---------------------------------------------------------------------------
# approximate centers (cell_id.rs:421-480)
# ---------------------------------------------------------------------------

def get_center_si_ti(ids):
    """The reference's *approximate* center extraction (NOT a true Hilbert
    inverse) — cell_id.rs:439-480, including the u32 truncation of the
    shifted position."""
    ids = _u(ids)
    lv = level(ids).astype(np.int64)
    half = np.uint32(MAX_SIZE // 2)

    face_pos = pos(ids)
    shift = (2 * (MAX_LEVEL - np.clip(lv, 0, MAX_LEVEL))).astype(np.uint64)
    cell_index = ((face_pos >> shift) & U(0xFFFFFFFF)).astype(np.uint32)
    cells_per_side = (np.uint32(1) << np.clip(lv, 0, 31).astype(np.uint32))
    cell_size = (np.uint32(1) << (MAX_LEVEL - np.clip(lv, 0, MAX_LEVEL)).astype(np.uint32))
    with np.errstate(divide="ignore", invalid="ignore"):
        i = cell_index % np.maximum(cells_per_side, 1)
        j = cell_index // np.maximum(cells_per_side, 1)
    si = i * cell_size + cell_size // np.uint32(2)
    ti = j * cell_size + cell_size // np.uint32(2)
    si = np.minimum(si, np.uint32(MAX_SIZE - 1))
    ti = np.minimum(ti, np.uint32(MAX_SIZE - 1))
    si = np.where(lv <= 0, half, si)
    ti = np.where(lv <= 0, half, ti)
    return si, ti


def to_point_raw(ids):
    """Cell id -> (approximate) center point on the unit sphere
    (cell_id.rs:421-433).  Invalid ids map to (1,0,0)."""
    ids = _u(ids)
    si, ti = get_center_si_ti(ids)
    u = st_to_uv_linear(si)
    v = st_to_uv_linear(ti)
    x, y, z = face_uv_to_xyz(face(ids), u, v)
    # S2Point::from_vec3 re-normalizes by dividing by sqrt(length_squared).
    n = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / n, y / n, z / n
    bad = ~is_valid(ids)
    x = np.where(bad, 1.0, x)
    y = np.where(bad, 0.0, y)
    z = np.where(bad, 0.0, z)
    return x, y, z


# ---------------------------------------------------------------------------
# neighbors (placeholder semantics, cell_id.rs:696-722) and width metrics
# ---------------------------------------------------------------------------

def append_all_neighbors(id_: int, lv: int) -> list[int]:
    """Id-space +/- one step 'neighbors' — reproduces the reference's
    placeholder exactly (cell_id.rs:696-722)."""
    cur_level = int(level(U(id_)))
    target = int(parent_at_level(U(id_), lv)) if cur_level > lv else int(id_)
    step = int(lsb_for_level(lv)) << 1
    out = []
    if target >= step:
        prev_id = U(target - step)
        if bool(is_valid(prev_id)) and int(level(prev_id)) == lv:
            out.append(int(prev_id))
    next_ = U((target + step) & 0xFFFFFFFFFFFFFFFF)
    if bool(is_valid(next_)) and int(level(next_)) == lv:
        out.append(int(next_))
    return out


def level_for_min_width(min_width: float) -> int:
    """Simplified width->level (cell_id.rs:725-738): face_width=2, halve
    per level."""
    width = 2.0
    lv = 0
    while width > min_width and lv < MAX_LEVEL:
        lv += 1
        width /= 2.0
    return lv


def min_width_at_level(lv: int) -> float:
    return 2.0 / float(1 << lv)


class LengthMetric:
    """cell_id.rs:59-88 (note get_closest_level uses log2(value/deriv),
    the reference's sign quirk — NOT canonical log2(deriv/value))."""

    def __init__(self, dim: float, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def get_value(self, lv: int) -> float:
        return self.deriv / float(1 << (int(self.dim) * lv))

    def get_closest_level(self, value: float) -> int:
        if value <= 0.0:
            return MAX_LEVEL
        lv = np.log2(value / self.deriv) / self.dim
        # Rust f64::round() = half away from zero (NOT banker's rounding).
        lv = int(np.floor(lv + 0.5)) if lv >= 0 else int(np.ceil(lv - 0.5))
        return max(0, min(MAX_LEVEL, lv))


AVG_EDGE_METRIC = LengthMetric(1.0, 1.459213746386106062)
