"""kNN (brute-force exactness vs numpy oracle; cell-ring recall) and
cell-union DataFrame algebra parity with the reference kernels."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels import unions as ku
from s2_geometry_rust_spark.operators.knn import knn_bruteforce, knn_cell_ring
from s2_geometry_rust_spark.operators.unions_ops import (
    contains_flags,
    difference_grouped,
    intersection_grouped,
    normalize_distributed,
    normalize_grouped,
    union_grouped,
)


def _sphere(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def knn_data(spark):
    cand = _sphere(4000, 1)
    qry = _sphere(25, 2)
    cand_ids = ck.from_point(cand[:, 0], cand[:, 1], cand[:, 2])
    qry_ids = ck.from_point(qry[:, 0], qry[:, 1], qry[:, 2])
    cdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "cand_id": np.arange(len(cand)),
                "x": cand[:, 0], "y": cand[:, 1], "z": cand[:, 2],
                "cell_id": cand_ids.view(np.int64),
            }
        )
    ).repartition(6)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(len(qry)),
                "x": qry[:, 0], "y": qry[:, 1], "z": qry[:, 2],
                "cell_id": qry_ids.view(np.int64),
            }
        )
    )
    return qdf, cdf, qry, cand


def test_knn_bruteforce_exact(spark, knn_data):
    qdf, cdf, qry, cand = knn_data
    k = 7
    got = knn_bruteforce(qdf, cdf, k).toPandas()
    assert len(got) == len(qry) * k
    for qi in range(len(qry)):
        d2 = ((cand - qry[qi]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(cand)), d2))
        want = order[:k]
        g = got[got.query_id == qi].sort_values("rank")
        np.testing.assert_array_equal(g.neighbor_id.to_numpy(), want)
        np.testing.assert_allclose(
            g.chord2.to_numpy(), d2[want], rtol=0, atol=0
        )


def test_knn_cell_ring_recall(spark, knn_data):
    qdf, cdf, qry, cand = knn_data
    k = 5
    exact = knn_bruteforce(qdf, cdf, k).toPandas()
    ring = knn_cell_ring(qdf, cdf, k, start_level=6).toPandas()
    # every query resolved with k neighbors
    counts = ring.groupby("query_id").size()
    assert (counts == k).all() and len(counts) == len(qry)
    # recall vs exact
    hits = 0
    for qi in range(len(qry)):
        e = set(exact[exact.query_id == qi].neighbor_id)
        r = set(ring[ring.query_id == qi].neighbor_id)
        hits += len(e & r)
    recall = hits / (len(qry) * k)
    assert recall >= 0.6, f"cell-ring recall too low: {recall}"


@pytest.fixture(scope="module")
def union_fixture(spark):
    """whole-face children + scattered cells (cell_union.rs test style)."""
    face0 = int(ck.from_face_pos_level(0, 0, 0))
    children = [int(c) for c in ck.children(np.uint64(face0))]
    grandkids = [int(c) for c in ck.children(np.uint64(children[0]))]
    pts = _sphere(50, 3)
    scattered = [int(i) for i in ck.parent(
        ck.from_point(pts[:, 0], pts[:, 1], pts[:, 2]),
        np.full(50, 10),
    )]
    return children, grandkids, scattered


def _df(spark, uid, ids):
    return spark.createDataFrame(
        [(uid, np.uint64(i).astype(np.int64).item()) for i in ids],
        "union_id string, cell_id long",
    )


def test_normalize_grouped_collapses_siblings(spark, union_fixture):
    children, grandkids, scattered = union_fixture
    df = _df(spark, "u1", children + scattered)
    got = normalize_grouped(df).toPandas()
    ids = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
    want = ku.normalize(np.array(children + scattered, dtype=np.uint64))
    np.testing.assert_array_equal(ids, np.sort(want))
    # 4 children collapse into face cell which then absorbs scattered face-0 cells
    faces = ck.face(ids)
    assert int(ck.from_face_pos_level(0, 0, 0)) in [int(i) for i in ids]
    assert not (faces == 0).sum() > 1  # face-0 scattered cells absorbed


def test_normalize_distributed_matches_kernel(spark, union_fixture):
    children, grandkids, scattered = union_fixture
    for uid, ids in [
        ("a", children + scattered),
        ("b", grandkids + children[1:] + scattered[:10]),
        ("c", scattered),
    ]:
        df = _df(spark, uid, ids)
        got = normalize_distributed(df).toPandas()
        g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
        want = np.sort(ku.normalize(np.array(ids, dtype=np.uint64)))
        np.testing.assert_array_equal(g, want, err_msg=uid)


def test_pairwise_set_ops_match_kernels(spark, union_fixture):
    children, grandkids, scattered = union_fixture
    a_ids = ku.normalize(np.array(children[:2] + scattered[:20], np.uint64))
    b_ids = ku.normalize(np.array(grandkids + scattered[10:30], np.uint64))
    a = _df(spark, "u", [int(i) for i in a_ids])
    b = _df(spark, "u", [int(i) for i in b_ids])
    for op, kernel in [
        (union_grouped, ku.union),
        (intersection_grouped, ku.intersection),
        (difference_grouped, ku.difference),
    ]:
        got = op(a, b).toPandas()
        g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
        want = np.sort(np.asarray(kernel(a_ids, b_ids), np.uint64))
        np.testing.assert_array_equal(g, want, err_msg=op.__name__)


def test_contains_flags_matches_kernel(spark, union_fixture):
    children, grandkids, scattered = union_fixture
    u_ids = ku.normalize(np.array(children[:1] + scattered[:25], np.uint64))
    probes = grandkids + scattered[20:40]
    u = _df(spark, "u", [int(i) for i in u_ids])
    p = spark.createDataFrame(
        [("u", np.uint64(i).astype(np.int64).item()) for i in probes],
        "union_id string, cell_id long",
    )
    got = contains_flags(u, p).toPandas()
    got_set = set(got.probe_cell.to_numpy(np.int64).view(np.uint64).tolist())
    want = {int(c) for c in probes if ku.contains_cell_id(u_ids, int(c))}
    assert got_set == want


def test_expand_distributed_matches_kernel(spark, union_fixture):
    """Scale-path expand (codegen candidates + distributed normalize
    fixpoint) == the reference kernel, incl. face-boundary wraps (the
    usk-domain +/- step) and coarser-than-target cells."""
    from s2_geometry_rust_spark.operators.unions_ops import (
        expand_distributed,
    )

    children, grandkids, scattered = union_fixture
    for lv in (0, 4, 12):
        for uid, ids in [
            ("a", scattered),
            ("b", grandkids + scattered[:10]),
        ]:
            df = _df(spark, uid, ids)
            got = expand_distributed(df, lv).toPandas()
            g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
            want = np.sort(ku.expand(
                ku.normalize(np.array(ids, np.uint64)), lv))
            # kernel callers normalize first; expand of a raw set and of
            # its normalized form share the same normal form
            np.testing.assert_array_equal(g, want, err_msg=f"{uid}@{lv}")


def test_expand_with_radius_distributed_matches_kernel(spark, union_fixture):
    from s2_geometry_rust_spark.operators.unions_ops import (
        expand_with_radius_distributed,
    )

    children, grandkids, scattered = union_fixture
    # contract (same as the grouped twin): the input is a NORMALIZED
    # union — min_level must be taken after sibling collapse
    ids = ku.normalize(np.array(grandkids + scattered, np.uint64))
    df = _df(spark, "u", [int(i) for i in ids])
    for radius, diff in [(0.0003, 3), (1e-6, 2), (3.0, 20)]:
        got = expand_with_radius_distributed(df, radius, diff).toPandas()
        g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
        want = np.sort(ku.expand_with_radius(ids, radius, diff))
        np.testing.assert_array_equal(g, want, err_msg=str(radius))


def test_expand_distributed_face_boundary_wraps(spark):
    """The ANSI-safety edges of the codegen candidate stage: cells at
    the very start/end of each face, including face 3's top (one step
    crosses into face 4 = the int64 sign flip, where a plain + would
    ANSI-overflow) and face 5's top (the u64 ceiling — next wraps to
    an invalid id and must be dropped exactly as the kernel drops
    it)."""
    from s2_geometry_rust_spark.operators.unions_ops import (
        expand_distributed,
    )

    for lv in (1, 12, 30):
        lsb = int(ck.lsb_for_level(lv))
        cells = []
        for face in (0, 3, 4, 5):
            base = face << 61
            cells += [base + lsb, base + (1 << 61) - lsb]
        ids = ku.normalize(np.array(cells, dtype=np.uint64))
        df = _df(spark, "edge", [int(i) for i in ids])
        got = expand_distributed(df, lv).toPandas()
        g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
        want = np.sort(ku.expand(ids, lv))
        np.testing.assert_array_equal(g, want, err_msg=f"lv={lv}")
