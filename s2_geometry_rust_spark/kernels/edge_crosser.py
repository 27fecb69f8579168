"""S2EdgeCrosser chain-crossing kernel (mirror of
/root/reference/src/edge_crosser.rs:106-170).

This is the reference's *second* crossing test, distinct from
predicates::crossing_sign (SURVEY.md §8.5): a plain-float orientation
test returning +1 / 0 / -1, where 0 means an exactly-shared vertex
(euclidean distance < 1e-15), plus the degenerate both-zero branch.
Chain usage (v0->v1->v2->...) caches the previous vertex, so a chain of
n edges against a fixed AB costs n tests, not 2n.

Vectorized over a whole chain at once: all pairwise orientation dots in
one pass of numpy; the sequential "state" of the reference collapses to
a shifted-array formulation because the cached values are pure functions
of the current edge.
"""

from __future__ import annotations

import numpy as np

_SHARE_EPS = 1e-15


def crossing_signs_chain(a: np.ndarray, b: np.ndarray,
                         chain: np.ndarray) -> np.ndarray:
    """Signs of edge AB vs each chain edge (chain[i], chain[i+1]).

    a, b: (3,) fixed edge endpoints; chain: (n,3) vertices.
    Returns (n-1,) int32 of +1 / 0 / -1 per edge_crosser.rs:126-170.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    chain = np.asarray(chain, np.float64).reshape(-1, 3)
    c = chain[:-1]
    d = chain[1:]

    # exact vertex sharing (glam length < 1e-15 on the difference)
    def _shares(p):
        return (
            (np.linalg.norm(p - a, axis=1) < _SHARE_EPS)
            | (np.linalg.norm(p - b, axis=1) < _SHARE_EPS)
        )

    shared = _shares(c) | _shares(d)

    ab = np.cross(a, b)
    acb = c @ ab
    adb = d @ ab
    cd = np.cross(c, d)
    cda = cd @ a
    cdb = cd @ b

    proper = (acb * adb < 0.0) & (cda * cdb < 0.0)
    touching = (
        (acb * adb == 0.0)
        & (cda * cdb == 0.0)
        & ((acb != 0.0) | (adb != 0.0))
        & ((cda != 0.0) | (cdb != 0.0))
    )
    out = np.where(proper | touching, 1, -1).astype(np.int32)
    out[shared] = 0
    return out


def chain_has_crossing(a: np.ndarray, b: np.ndarray,
                       chain: np.ndarray) -> bool:
    return bool(np.any(crossing_signs_chain(a, b, chain) > 0))


def crossing_signs_chain_batch(a: np.ndarray, b: np.ndarray,
                               chain: np.ndarray) -> np.ndarray:
    """Batched variant: m query edges vs one chain in a single numpy
    pass — (m, n-1) signs, row i identical to
    crossing_signs_chain(a[i], b[i], chain).

    a, b: (m,3) edge endpoints; chain: (n,3) vertices.  Memory is
    O(m*n); callers batch per (line, shape) group where both factors
    are bounded by per-shape edge counts, not table size.
    """
    a = np.asarray(a, np.float64).reshape(-1, 3)
    b = np.asarray(b, np.float64).reshape(-1, 3)
    chain = np.asarray(chain, np.float64).reshape(-1, 3)
    c = chain[:-1]  # (n-1, 3)
    d = chain[1:]

    def _shares(p):  # (m, n-1) — p within 1e-15 of a or b
        da = np.linalg.norm(p[None, :, :] - a[:, None, :], axis=2)
        db = np.linalg.norm(p[None, :, :] - b[:, None, :], axis=2)
        return (da < _SHARE_EPS) | (db < _SHARE_EPS)

    shared = _shares(c) | _shares(d)

    ab = np.cross(a, b)          # (m, 3)
    acb = ab @ c.T               # (m, n-1)
    adb = ab @ d.T
    cd = np.cross(c, d)          # (n-1, 3)
    cda = a @ cd.T               # (m, n-1)
    cdb = b @ cd.T

    proper = (acb * adb < 0.0) & (cda * cdb < 0.0)
    touching = (
        (acb * adb == 0.0)
        & (cda * cdb == 0.0)
        & ((acb != 0.0) | (adb != 0.0))
        & ((cda != 0.0) | (cdb != 0.0))
    )
    out = np.where(proper | touching, 1, -1).astype(np.int32)
    out[shared] = 0
    return out
