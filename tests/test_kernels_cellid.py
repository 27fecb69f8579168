"""Parity tests for the cell-id kernel, mirroring the reference's own
unit tests (/root/reference/tests/test_s2cell_id_port.rs and
src/cell_id.rs inline tests)."""

import numpy as np
import pytest

from s2_geometry_rust_spark.kernels import cellid as C

U = np.uint64


def _sphere_points(n, seed=42):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


class TestFaceAssignment:
    # test_s2cell_id_port.rs:84-92 golden cardinal directions
    def test_cardinal_faces(self):
        pts = np.array([
            [1, 0, 0], [0, 1, 0], [0, 0, 1],
            [-1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=float)
        ids = C.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
        assert list(C.face(ids)) == [0, 1, 2, 3, 4, 5]

    def test_from_point_is_leaf(self):
        v = _sphere_points(1000)
        ids = C.from_point(v[:, 0], v[:, 1], v[:, 2])
        assert np.all(C.level(ids) == 30)
        assert np.all(C.is_leaf(ids))
        assert np.all(C.is_valid(ids))


class TestHierarchy:
    # test_s2cell_id_port.rs:133-135 algebraic invariant
    def test_range_invariant(self):
        v = _sphere_points(5000)
        ids = C.from_point(v[:, 0], v[:, 1], v[:, 2])
        assert np.all(ids * U(2) == C.range_min(ids) + C.range_max(ids))

    def test_parent_contains(self):
        v = _sphere_points(2000)
        ids = C.from_point(v[:, 0], v[:, 1], v[:, 2])
        for lv in (0, 5, 12, 29):
            p = C.parent(ids, lv)
            assert np.all(C.level(p) == lv)
            assert np.all(C.contains(p, ids))
            assert np.all(C.intersects(p, ids))

    def test_children_partition_parent(self):
        v = _sphere_points(100)
        parents = C.parent(C.from_point(v[:, 0], v[:, 1], v[:, 2]), 10)
        ch = C.children(parents)
        assert ch.shape == (100, 4)
        assert np.all(C.level(ch.ravel()) == 11)
        # children tile the parent's leaf range exactly
        assert np.all(C.range_min(ch[:, 0]) == C.range_min(parents))
        assert np.all(C.range_max(ch[:, 3]) == C.range_max(parents))
        for k in range(3):
            # leaf ids are odd, so consecutive child ranges differ by 2
            assert np.all(C.range_max(ch[:, k]) + U(2) == C.range_min(ch[:, k + 1]))

    def test_face_cells(self):
        # cell_id.rs:782-791 inline test
        for f in range(6):
            cid = U(C.from_face_pos_level(f, 0, 0))
            assert int(C.face(cid)) == f
            assert int(C.level(cid)) == 0
            assert bool(C.is_valid(cid))
            assert not bool(C.is_leaf(cid))

    def test_invalid_level_of_zero(self):
        assert int(C.level(U(0))) == -1


class TestTokens:
    # test_s2cell_id_port.rs:245-276
    def test_round_trip(self):
        v = _sphere_points(2000)
        ids = C.from_point(v[:, 0], v[:, 1], v[:, 2])
        toks = C.to_token(ids)
        assert np.all(C.from_token(toks) == ids)

    def test_order_preserving(self):
        v = _sphere_points(2000)
        ids = np.sort(C.from_point(v[:, 0], v[:, 1], v[:, 2]))
        toks = list(C.to_token(ids))
        assert toks == sorted(toks)

    def test_invalid_token(self):
        assert list(C.to_token(np.array([0], dtype=np.uint64))) == ["X"]
        assert int(C.from_token(["X"])[0]) == 0


class TestLinearST:
    # the cell-id path's private linear ST (cell_id.rs:542-557)
    def test_uv_st_round_trip(self):
        u = np.linspace(-1, 1, 10001)[:-1]
        st = C.uv_to_st_linear(u)
        back = C.st_to_uv_linear(st)
        assert np.all(np.abs(back - u) <= 2.0 / C.MAX_SIZE)

    def test_clamping(self):
        assert int(C.uv_to_st_linear(np.array([1.5]))[0]) == C.MAX_SIZE - 1
        assert int(C.uv_to_st_linear(np.array([-1.5]))[0]) == 0


class TestNavigation:
    def test_next(self):
        f0 = U(C.from_face_pos_level(0, 0, 2))
        nxt = C.next_id(f0)
        assert int(C.level(nxt)) == 2
        assert int(C.range_min(nxt)) == int(C.range_max(f0)) + 2

    def test_begin_end_cover_sphere(self):
        # begin/end bounds (cell_id.rs:660-667)
        assert C.begin(30) == 1
        assert C.end(30) == int(C.next_id(U(C.from_face_pos_level(5, 0, 30))))

    def test_maximum_tile(self):
        b = C.begin(30)
        e = C.end(30)
        t = C.maximum_tile(b, e)
        assert int(C.level(U(t))) == 0  # first face cell fits

    def test_parent_at_level_identity_above(self):
        cid = U(C.from_face_pos_level(3, 0, 4))
        assert int(C.parent_at_level(cid, 10)) == int(cid)
        assert int(C.level(C.parent_at_level(cid, 2))) == 2


class TestNeighbors:
    # placeholder semantics (cell_id.rs:696-722): id-space +/- step,
    # weak assertions like test_s2cell_id_port.rs:311-344
    def test_neighbors_same_level(self):
        v = _sphere_points(50)
        ids = C.parent(C.from_point(v[:, 0], v[:, 1], v[:, 2]), 10)
        for cid in ids:
            for n in C.append_all_neighbors(int(cid), 10):
                assert bool(C.is_valid(U(n)))
                assert int(C.level(U(n))) == 10
                assert n != int(C.parent_at_level(cid, 10))


class TestMetrics:
    def test_avg_edge_metric(self):
        m = C.AVG_EDGE_METRIC
        assert m.get_value(0) == pytest.approx(1.459213746386106062)
        assert m.get_value(1) == pytest.approx(1.459213746386106062 / 2)
        # the reference's inverted-log quirk: values below deriv clamp to 0
        assert m.get_closest_level(0.1) == 0

    def test_level_for_min_width(self):
        assert C.level_for_min_width(2.0) == 0
        assert C.level_for_min_width(1.0) == 1
        assert C.level_for_min_width(0.25) == 3
        assert C.min_width_at_level(3) == 0.25


class TestSignedBoundary:
    def test_faces_4_5_set_sign_bit(self):
        # u64 ids with face >= 4 exceed int64 max — ordering helpers must
        # use the XOR-2^63 shift (SURVEY.md §8.7)
        f0 = int(C.from_face_pos_level(0, 0, 0))
        f4 = int(C.from_face_pos_level(4, 0, 0))
        assert f4 > 2**63 > f0
        # raw two's-complement reinterpret breaks ordering...
        s0 = np.int64(f0)
        s4 = np.int64(f4 - 2**64)
        assert s4 < s0  # WRONG order vs unsigned f0 < f4
        # ...the XOR-2^63 shift restores it in the signed domain
        o0 = np.int64(int(np.uint64(f0) ^ U(1 << 63)) - 2**64)
        o4 = np.int64(int(np.uint64(f4) ^ U(1 << 63)))
        assert o0 < o4
