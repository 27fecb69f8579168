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
