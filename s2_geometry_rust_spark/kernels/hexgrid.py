"""H3-style aperture-7 hexagonal grid over the S2 cube-face planes.

The north rule asks for an "H3/S2 index".  The S2 side is the Hilbert
cell-id core (kernels/cellid.py, reference parity).  This module is the
H3 side: a hexagonal multi-resolution index with H3's defining
properties — aperture-7 refinement (each finer grid has 7x the cell
density), the ~19.1066 degree inter-resolution rotation (the argument
of the norm-7 Eisenstein integer 3+w, w=exp(2*pi*i/3), which is exactly
how H3 relates Class II to Class III grids), cube-rounded axial
assignment, k-ring neighborhoods, and center-containment parenthood.

It is deliberately NOT a bit-level port of Uber's H3 (whose 122-entry
icosahedral base-cell tables are not reproducible from first
principles): the base surface here is the S2 cube — each of the 6 faces
carries its own hex lattice on the gnomonic (u, v) plane, reusing the
engine's bit-exact face projection (kernels/coords.py:106-133,
reference math.rs:206-246).  Indexes are face-local; cross-face
neighbor stitching is out of scope and documented as such.

Determinism contract (the reason this file exists instead of calling a
hex library): every per-resolution constant (rotation cos/sin, scale
factors) is computed ONCE here with Python libm and then injected as a
double literal into all three consumers — the numpy kernels below, the
Spark Column expressions (functions/hexcols.py), and the DuckDB oracle
SQL (oracle.hex_*_sql).  Downstream arithmetic is only *, +, -, /, abs,
floor and comparisons — all exactly rounded IEEE-754 ops — in the same
textual order, so the three engines produce bit-identical assignments.

Layout of the packed 64-bit id (always non-negative as int64):

    [63]=0 [62:60]=face [59:56]=res [55:28]=q+2^27 [27:0]=r+2^27

q, r are pointy-top axial coordinates.  At MAX_RES=15 the hex size is
7^-7.5 ~ 4.6e-7 UV units (~3 m on Earth), |q|,|r| < 3e6 << 2^27.
"""

from __future__ import annotations

import math

import numpy as np

MAX_RES = 15
OFF = 1 << 27

SQRT3 = math.sqrt(3.0)
# Argument of the Eisenstein integer 3+w (norm 7): the aperture-7
# inter-resolution rotation, identical to H3's Class II<->III skew.
ALPHA = math.atan2(SQRT3, 5.0)

# Per-resolution constants.  s_r = 7^(-r/2): hex circumradius in UV
# units; theta_r = r * ALPHA.  C*: forward (grid-frame point -> frac
# axial); D*: inverse (axial -> grid-frame center).
COS = [math.cos(r * ALPHA) for r in range(MAX_RES + 1)]
SIN = [math.sin(r * ALPHA) for r in range(MAX_RES + 1)]
_S = [7.0 ** (-0.5 * r) for r in range(MAX_RES + 1)]
C1 = [(SQRT3 / 3.0) / s for s in _S]
C2 = [(1.0 / 3.0) / s for s in _S]
C3 = [(2.0 / 3.0) / s for s in _S]
D1 = [s * SQRT3 for s in _S]
D2 = [s * (SQRT3 / 2.0) for s in _S]
D3 = [s * 1.5 for s in _S]

# Axial unit directions, CCW from +q (shared with ring/disk and the
# lattice hex distance).
DIRECTIONS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def uv_to_axial(u, v, res: int):
    """(u, v) face-plane point -> integer axial (q, r) at ``res``.

    Rotate into the grid frame, scale to fractional axial coordinates
    (pointy-top), then cube-round.  The exact op order here is the
    normative one mirrored by functions/hexcols.py and oracle.py.
    """
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    c, s = COS[res], SIN[res]
    xp = c * u + s * v
    yp = c * v - s * u
    qf = C1[res] * xp - C2[res] * yp
    rf = C3[res] * yp
    return cube_round(qf, rf)


def cube_round(qf, rf):
    """Nearest hex by cube-coordinate rounding (public H3/redblobgames
    algorithm): round each cube axis, then repair the axis with the
    largest rounding error so x+y+z == 0 holds."""
    qf = np.asarray(qf, dtype=np.float64)
    rf = np.asarray(rf, dtype=np.float64)
    yf = (-qf) - rf
    rx = np.floor(qf + 0.5).astype(np.int64)
    ry = np.floor(yf + 0.5).astype(np.int64)
    rz = np.floor(rf + 0.5).astype(np.int64)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_x | fix_y, rz, -rx - ry)
    return q.astype(np.int64), r.astype(np.int64)


def axial_to_uv(q, r, res: int):
    """Hex center of axial (q, r) at ``res`` in face-plane (u, v)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    xl = D1[res] * q + D2[res] * r
    yl = D3[res] * r
    c, s = COS[res], SIN[res]
    u = c * xl - s * yl
    v = s * xl + c * yl
    return u, v


def pack(face, res: int, q, r):
    """(face, res, q, r) -> int64 id (layout in module docstring)."""
    face = np.asarray(face, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return (face << 60) | (np.int64(res) << 56) | ((q + OFF) << 28) | (r + OFF)


def unpack(hid):
    hid = np.asarray(hid, dtype=np.int64)
    face = (hid >> 60) & 7
    res = (hid >> 56) & 15
    q = ((hid >> 28) & (OFF * 2 - 1)) - OFF
    r = (hid & (OFF * 2 - 1)) - OFF
    return face, res, q, r


def hex_index(u, v, face, res: int):
    q, r = uv_to_axial(u, v, res)
    return pack(face, res, q, r)


def parent(hid):
    """Aperture-7 parent: the res-1 hex containing this hex's center.

    Like real H3, children are not geometrically nested in the parent
    (aperture-7 lattices cannot nest); parenthood is center
    containment, which is still a partition of each resolution's cells.
    """
    face, res, q, r = unpack(hid)
    if np.any(res < 1):
        raise ValueError("res-0 cells have no parent")
    rr = int(np.asarray(res).flat[0])
    if not np.all(res == rr):
        raise ValueError("mixed resolutions in parent()")
    u, v = axial_to_uv(q, r, rr)
    pq, pr = uv_to_axial(u, v, rr - 1)
    return pack(face, rr - 1, pq, pr)


def hex_distance(q1, r1, q2, r2):
    """Lattice (k-ring) distance between axial coordinates."""
    dq = np.asarray(q1, dtype=np.int64) - np.asarray(q2, dtype=np.int64)
    dr = np.asarray(r1, dtype=np.int64) - np.asarray(r2, dtype=np.int64)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def disk_offsets(k: int):
    """All (dq, dr) with lattice distance <= k: 3k(k+1)+1 offsets, in a
    deterministic (distance, then CCW) order."""
    out = [(0, 0)]
    for ring in range(1, k + 1):
        # start at direction 4 scaled (H3's kRing convention: walk the
        # ring with the 6 directions, ``ring`` steps each)
        dq, dr = ring * DIRECTIONS[4][0], ring * DIRECTIONS[4][1]
        for d in range(6):
            for _ in range(ring):
                out.append((dq, dr))
                dq += DIRECTIONS[d][0]
                dr += DIRECTIONS[d][1]
    return out
