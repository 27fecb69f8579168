"""Guards for the SQL-oracled robust-predicate contract queries.

The DuckDB oracles for edge_crossings / polyline_crossings reproduce the
triage determinant tier plus the degenerate-triangle rule, but NOT the
symbolic-perturbation tier (it needs IEEE bit patterns).  These tests
pin the fixture invariant that makes that sound: no candidate pair's
determinant lands in the unresolved band with three distinct vertices.
If someone edits the fixture sets, this fails before the driver does.
"""

from __future__ import annotations

import numpy as np

from s2_geometry_rust_spark.engine_queries import (
    EDGE_CROSS_A_SIDS,
    EDGE_CROSS_LEVEL,
    EDGE_CROSS_LOOPS,
    POLYLINE_LINES,
)
from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels import latlng as lk
from s2_geometry_rust_spark.kernels import predicates as pred
from s2_geometry_rust_spark import fixtures


def _verts(pts):
    lat = lk.degrees_to_radians(np.array([p[0] for p in pts], np.float64))
    lng = lk.degrees_to_radians(np.array([p[1] for p in pts], np.float64))
    x, y, z = lk.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=-1)


def _sign_triples(a, b, c, d):
    return [(a, c, b), (b, d, c), (c, a, d), (d, b, a)]


def _l2(u, v):
    return ((u[0] - v[0]) ** 2 + (u[1] - v[1]) ** 2 + (u[2] - v[2]) ** 2)


def _expressible(p, q, r) -> bool:
    det = pred.triage_det(*p, *q, *r)
    if abs(det) > pred.TRIAGE_ERROR_THRESHOLD:
        return True
    return (_l2(p, q) < pred.DEGENERATE_EPS or _l2(q, r) < pred.DEGENERATE_EPS
            or _l2(p, r) < pred.DEGENERATE_EPS)


def test_edge_crossings_fixture_dets_sql_expressible():
    edges = []
    for sid, (name, pts) in enumerate(sorted(
            {n: fixtures.LOOPS[n] for n in EDGE_CROSS_LOOPS}.items())):
        v = _verts(pts)
        n = len(v)
        for e in range(n):
            edges.append((sid, v[e], v[(e + 1) % n]))

    def pcell(v0):
        leaf = ck.from_point(np.array([v0[0]]), np.array([v0[1]]),
                             np.array([v0[2]]))
        return ck.parent_at_level(leaf.astype(np.uint64),
                                  EDGE_CROSS_LEVEL)[0]

    a = [(s, v0, v1, pcell(v0)) for s, v0, v1 in edges
         if s in EDGE_CROSS_A_SIDS]
    b = [(s, v0, v1, pcell(v0)) for s, v0, v1 in edges
         if s not in EDGE_CROSS_A_SIDS]
    n_cand = 0
    for (_, av0, av1, ca) in a:
        for (_, bv0, bv1, cb) in b:
            if ca != cb:
                continue
            n_cand += 1
            for (p, q, r) in _sign_triples(av0, av1, bv0, bv1):
                assert _expressible(p, q, r), (av0, bv0)
    assert n_cand > 10  # the index path actually produces work


def test_polyline_crossings_fixture_dets_sql_expressible():
    vlists = {n: _verts(v) for n, v in POLYLINE_LINES.items()}
    names = sorted(vlists)
    n_crossing_checked = 0
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            va, vb = vlists[na], vlists[nb]
            for ia in range(len(va) - 1):
                for ib in range(len(vb) - 1):
                    for (p, q, r) in _sign_triples(va[ia], va[ia + 1],
                                                   vb[ib], vb[ib + 1]):
                        det = pred.triage_det(*p, *q, *r)
                        assert abs(det) > pred.TRIAGE_ERROR_THRESHOLD
                        n_crossing_checked += 1
    assert n_crossing_checked > 0


def test_cells_true_vertices_round_trip_all_faces():
    """face_uv_to_xyz_inverse must invert xyz_to_face_uv on EVERY face:
    a point slightly inside each cell corner must map back into the
    cell's id range (the face-5 u-mirror in the reference's private
    face_uv_to_xyz silently broke this for coverings)."""
    from s2_geometry_rust_spark.kernels import cells_true as ct

    rng = np.random.default_rng(7)
    # cells across all faces and several levels
    pts = rng.normal(size=(200, 3))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    leafs = ck.from_point(pts[:, 0], pts[:, 1], pts[:, 2]).astype(np.uint64)
    for lvl in (0, 1, 2, 5, 10):
        cells = np.unique(ck.parent_at_level(leafs, lvl))
        face, u_lo, u_hi, v_lo, v_hi = ct.cell_uv_bounds(cells)
        for fu, fv in ((0.25, 0.25), (0.75, 0.25), (0.75, 0.75),
                       (0.25, 0.75), (0.5, 0.5)):
            uu = u_lo + fu * (u_hi - u_lo)
            vv = v_lo + fv * (v_hi - v_lo)
            x, y, z = ct.face_uv_to_xyz_inverse(face, uu, vv)
            back = ck.parent_at_level(
                ck.from_point(x, y, z).astype(np.uint64), lvl
            )
            np.testing.assert_array_equal(back, cells)


def test_ann_ivf_fixture_margins():
    """The ann_ivf oracle compares ids/ranks only; the engine computes
    cosines via normalize-then-GEMM while SQL divides the raw dot by the
    norm product (~1 ulp apart).  Pin >=1e-9 gaps on every decision the
    query makes at sf0.01: centroid assignment (top-1 vs top-2), probe
    boundary (n_probe-th vs next), and the top-k rank boundary."""
    import duckdb

    n_centroids, n_probe, n_queries, k = 16, 4, 20, 10
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM "
        "'/root/testdata/sf0.01/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    centers = mat[ids < n_centroids]
    sims = mat @ centers.T

    top2 = np.sort(sims, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0] > 1e-9).all(), "assignment margin"

    qsims = sims[ids < n_queries]
    qs = np.sort(qsims, axis=1)
    assert (qs[:, -n_probe] - qs[:, -(n_probe + 1)] > 1e-9).all(), \
        "probe-boundary margin"

    # rank margins inside each query's probed candidate set
    assign = np.argmax(sims, axis=1)
    probe = np.argsort(-qsims, axis=1)[:, :n_probe]
    allcos = mat @ mat.T
    for qi in range(n_queries):
        cand = np.where(np.isin(assign, probe[qi]) & (ids != ids[qi]))[0]
        cos = np.sort(allcos[qi, cand])[::-1]
        gaps = -np.diff(cos[: k + 1])
        assert (gaps > 1e-12).all(), f"rank margin, query {qi}"
