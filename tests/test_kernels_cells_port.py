"""S2Cell golden parity mirrored from
/root/reference/tests/test_s2cell_port.rs — restricted to assertions the
reference *source* can satisfy (its test_faces asserts
orientation == face & SWAP_MASK while compute_orientation is a
hard-coded 0 placeholder, cell.rs:350-354; such dead assertions are not
mirrored — SURVEY.md §8.2)."""

import numpy as np
import pytest

from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels.cells import S2Cell


@pytest.mark.parametrize("face", range(6))
def test_face_cells_basics(face):
    cid = int(ck.from_face_pos_level(face, 0, 0))
    cell = S2Cell(cid)
    assert cell.id == cid
    assert cell.face == face
    assert cell.level == 0
    assert cell.orientation == 0  # reference placeholder semantics
    assert not bool(ck.is_leaf(np.uint64(cid)))


@pytest.mark.parametrize("face", range(6))
def test_face_cell_vertex_edge_orthogonality(face):
    # test_s2cell_port.rs:317-339: v_k . edge_k ~ 0 and edge direction
    # aligns with v_k x v_{k+1} — face cells have correct UV bounds
    cid = int(ck.from_face_pos_level(face, 0, 0))
    cell = S2Cell(cid)
    for k in range(4):
        vk = np.array(cell.get_vertex_raw(k), np.float64)
        vk1 = np.array(cell.get_vertex_raw((k + 1) % 4), np.float64)
        ek = np.array(cell.get_edge_raw(k), np.float64)
        assert abs(float(vk @ ek)) < 1e-10
        assert abs(float(vk1 @ ek)) < 1e-10
        cross = np.cross(vk, vk1)
        cross /= np.linalg.norm(cross)
        en = ek / np.linalg.norm(ek)
        assert float(cross @ en) > 0.9


def test_face_cell_contains_own_center():
    for face in range(6):
        cell = S2Cell(int(ck.from_face_pos_level(face, 0, 0)))
        cx, cy, cz = cell.get_center()
        assert bool(cell.contains_point(float(cx), float(cy), float(cz)))


def test_average_area_at_level():
    # total sphere area 4*pi split over 6 * 4^level cells
    for lv in (0, 1, 5, 10):
        a = S2Cell.average_area_at_level(lv)
        total = a * 6 * 4 ** lv
        assert abs(total - 4 * np.pi) < 1e-9


def test_contains_cell_hierarchy():
    cid = np.uint64(int(ck.from_face_pos_level(2, 0, 0)))
    parent = S2Cell(int(cid))
    for child_id in ck.children(cid):
        child = S2Cell(int(child_id))
        assert parent.contains_cell(child)
        assert not child.contains_cell(parent)
        assert parent.may_intersect(child)


def test_cap_and_rect_bounds_cover_vertices():
    rng = np.random.default_rng(11)
    v = rng.normal(size=(20, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leafs = ck.from_point(v[:, 0], v[:, 1], v[:, 2])
    for cid in ck.parent(leafs, np.full(20, 3)):
        cell = S2Cell(int(cid))
        (ccx, ccy, ccz), radius = cell.get_cap_bound()
        rect = cell.get_rect_bound()
        center = np.array([ccx, ccy, ccz])
        for k in range(4):
            vx, vy, vz = cell.get_vertex(k)
            ang = float(
                np.arccos(np.clip(center @ np.array([vx, vy, vz]), -1, 1))
            )
            if not np.isnan(radius):
                assert ang <= radius + 1e-9
            assert rect.contains_point(float(vx), float(vy), float(vz))
