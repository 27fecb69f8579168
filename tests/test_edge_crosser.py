"""EdgeCrosser chain kernel: golden cases mirrored from
/root/reference/src/edge_crosser.rs:423-499 inline tests."""

import numpy as np

from s2_geometry_rust_spark.kernels.edge_crosser import (
    chain_has_crossing,
    crossing_signs_chain,
)


def _n(x, y, z):
    v = np.array([x, y, z], np.float64)
    return v / np.linalg.norm(v)


A = _n(1, 0, 0)
B = _n(0, 1, 0)


def test_basic_crossing():
    # edge_crosser.rs test_basic_crossing: +1
    assert crossing_signs_chain(A, B, np.array([_n(0, 0, 1), _n(-1, 0, 0)]))[0] == 1


def test_no_crossing():
    assert crossing_signs_chain(A, B, np.array([_n(0, 0, 1), _n(0, 0, -1)]))[0] == -1


def test_shared_vertex():
    assert crossing_signs_chain(A, B, np.array([A, _n(0, 0, 1)]))[0] == 0


def test_chain_sequence():
    # chain v0 -> v1 -> v2: per-edge signs, exercising the cached-vertex
    # semantics (each consecutive pair is one test)
    chain = np.array([_n(0, 0, 1), _n(-1, 0, 0), _n(0, 0, -1), A])
    signs = crossing_signs_chain(A, B, chain)
    assert signs.shape == (3,)
    assert signs[0] == 1      # (0,0,1)->(-1,0,0) crosses AB (golden above)
    assert signs[2] == 0      # ...-> A shares a vertex
    assert chain_has_crossing(A, B, chain)


def test_chain_no_crossings():
    chain = np.array([_n(0, 0, 1), _n(0.1, 0.1, 1), _n(0.2, 0.1, 1)])
    assert not chain_has_crossing(A, B, chain)


def test_batch_matches_scalar_chain():
    from s2_geometry_rust_spark.kernels.edge_crosser import (
        crossing_signs_chain_batch,
    )

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(40, 3))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    chain = pts[:9]
    a = pts[9:24]
    b = pts[24:39]
    # plant exact shared vertices to hit the 0 branch
    a[0] = chain[2]
    b[1] = chain[5]
    got = crossing_signs_chain_batch(a, b, chain)
    assert got.shape == (15, 8)
    for i in range(len(a)):
        np.testing.assert_array_equal(
            got[i], crossing_signs_chain(a[i], b[i], chain)
        )
