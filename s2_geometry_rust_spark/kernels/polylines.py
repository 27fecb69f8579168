"""S2Polyline kernels (mirror of /root/reference/src/polyline.rs).

Semantics pinned to the reference:
- length = sum of atan2(|a x b|, a.b) vertex-pair angles
  (polyline.rs:182-199, point.rs:121-126);
- interpolate walks accumulated edge lengths then slerps within the
  edge (polyline.rs:215-259, 437-462);
- project = per-edge tangent-parameter projection, nearest edge wins
  (polyline.rs:279-311, 469-490);
- intersects = any edge pair with crossing_sign > 0
  (polyline.rs:316-338).
"""

from __future__ import annotations

import numpy as np

from . import predicates as pred


def angles(v: np.ndarray) -> np.ndarray:
    """Per-edge angles for an (n,3) vertex chain — atan2(|cross|, dot)."""
    a, b = v[:-1], v[1:]
    c = np.cross(a, b)
    return np.arctan2(np.linalg.norm(c, axis=1), np.einsum("ij,ij->i", a, b))


def length(v: np.ndarray) -> float:
    if len(v) < 2:
        return 0.0
    return float(angles(v).sum())


def _slerp(a: np.ndarray, b: np.ndarray, fraction: float) -> np.ndarray:
    if fraction <= 0.0:
        return a
    if fraction >= 1.0:
        return b
    dot = float(np.clip(np.dot(a, b), -1.0, 1.0))
    ang = np.arccos(dot)
    if ang < 1e-15:
        out = a * (1.0 - fraction) + b * fraction
        return out / np.linalg.norm(out)
    s = np.sin(ang)
    out = a * (np.sin((1.0 - fraction) * ang) / s) + b * (
        np.sin(fraction * ang) / s
    )
    return out / np.linalg.norm(out)


def interpolate(v: np.ndarray, fraction: float) -> np.ndarray:
    if len(v) == 0:
        return np.array([1.0, 0.0, 0.0])
    if len(v) == 1 or fraction <= 0.0:
        return v[0]
    if fraction >= 1.0:
        return v[-1]
    edge = angles(v)
    total = float(edge.sum())
    if total == 0.0:
        return v[0]
    target = fraction * total
    acc = 0.0
    for i in range(len(v) - 1):
        if acc + edge[i] >= target:
            ef = 0.0 if edge[i] == 0.0 else (target - acc) / edge[i]
            return _slerp(v[i], v[i + 1], ef)
        acc += edge[i]
    return v[-1]


def project(v: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, int]:
    """(closest point, next-vertex index) — polyline.rs:279-311."""
    best = None
    best_d = np.inf
    best_next = 1
    for i in range(len(v) - 1):
        a, b = v[i], v[i + 1]
        aq, bq, ab = float(np.dot(q, a)), float(np.dot(q, b)), float(np.dot(a, b))
        denom = 1.0 - ab * ab
        if denom < 1e-15:
            p = a
        else:
            t = np.clip((aq - bq * ab) / denom, 0.0, 1.0)
            p = _slerp(a, b, float(t))
        d = float(np.arctan2(np.linalg.norm(np.cross(q, p)), np.dot(q, p)))
        if d < best_d:
            best_d, best, best_next = d, p, i + 1
    return best if best is not None else v[0], best_next


def intersects(v1: np.ndarray, v2: np.ndarray) -> bool:
    """Any edge pair crossing (polyline.rs:316-338): O(n*m) pairs
    through the reference crossing_sign."""
    if len(v1) < 2 or len(v2) < 2:
        return False
    a = np.repeat(v1[:-1], len(v2) - 1, axis=0)
    b = np.repeat(v1[1:], len(v2) - 1, axis=0)
    c = np.tile(v2[:-1], (len(v1) - 1, 1))
    d = np.tile(v2[1:], (len(v1) - 1, 1))
    return bool(np.any(pred.crossing_sign_batch(a, b, c, d) > 0))


def reverse(v: np.ndarray) -> np.ndarray:
    """polyline.rs:335-343: vertices in reverse traversal order."""
    return np.asarray(v, dtype=np.float64)[::-1].copy()
