"""Term-index join (operators/term_index.py): the candidate stage must
be a lossless superset of true cap intersection, and the refined join
must equal the kernel predicate (kernels/caps.py:S2Cap.intersects)
pair-for-pair — on the contract fixtures AND on random cap sets."""

from __future__ import annotations

import numpy as np

from s2_geometry_rust_spark import fixtures


def _kernel_pairs(qcat, icat):
    from s2_geometry_rust_spark.kernels import latlng as lk
    from s2_geometry_rust_spark.kernels.caps import S2Cap

    def caps(cat):
        out = {}
        for name, (clat, clng, rdeg) in cat.items():
            lat = lk.degrees_to_radians(np.float64(clat))
            lng = lk.degrees_to_radians(np.float64(clng))
            x, y, z = lk.latlng_to_xyz(np.float64(lat), np.float64(lng))
            out[name] = S2Cap.from_center_degrees(
                (float(x), float(y), float(z)), float(rdeg)
            )
        return out

    qs, is_ = caps(qcat), caps(icat)
    return {
        (qn, in_)
        for qn, qc in qs.items()
        for in_, ic in is_.items()
        if qc.intersects(ic)
    }


def test_fixture_join_matches_kernel(spark):
    from s2_geometry_rust_spark.operators.term_index import (
        cap_intersect_join_terms, term_intersect_candidates)

    q = fixtures.cap_regions(spark, catalog=fixtures.TERM_QUERY_CAPS)
    i = fixtures.cap_regions(spark, catalog=fixtures.TERM_INDEX_CAPS)
    want = _kernel_pairs(fixtures.TERM_QUERY_CAPS, fixtures.TERM_INDEX_CAPS)
    got = {
        (r["query_id"], r["region_id"])
        for r in cap_intersect_join_terms(q, i).collect()
    }
    assert got == want
    cands = {
        (r["query_id"], r["region_id"])
        for r in term_intersect_candidates(q, i).collect()
    }
    assert cands >= want  # lossless superset
    assert len(want) > 0  # fixture is non-trivial


def test_random_caps_lossless(spark):
    """64 x 64 random caps: term candidates never miss a true pair and
    the refined join is exact."""
    from s2_geometry_rust_spark.operators.term_index import (
        cap_intersect_join_terms, term_intersect_candidates)

    rng = np.random.default_rng(7)

    def cat(prefix, n):
        return {
            f"{prefix}{k:03d}": (
                float(rng.uniform(-85, 85)),
                float(rng.uniform(-180, 180)),
                float(rng.uniform(0.1, 25.0)),
            )
            for k in range(n)
        }

    qcat, icat = cat("q", 64), cat("i", 64)
    q = fixtures.cap_regions(spark, catalog=qcat)
    i = fixtures.cap_regions(spark, catalog=icat)
    want = _kernel_pairs(qcat, icat)
    got = {
        (r["query_id"], r["region_id"])
        for r in cap_intersect_join_terms(q, i, max_cells=8).collect()
    }
    assert got == want
    cands = {
        (r["query_id"], r["region_id"])
        for r in term_intersect_candidates(q, i, max_cells=8).collect()
    }
    assert cands >= want
    # the index prunes: candidates should be far below all-pairs
    assert len(cands) < 64 * 64 * 0.5
    assert len(want) > 10


def test_empty_and_degenerate_caps(spark):
    """Zero-radius caps intersect only what contains their center;
    the join must not crash on them."""
    from s2_geometry_rust_spark.operators.term_index import (
        cap_intersect_join_terms)

    qcat = {"pt": (10.5, 20.5, 0.0)}
    icat = {"around": (10.5, 20.5, 5.0), "far": (-60.5, 100.5, 5.0)}
    q = fixtures.cap_regions(spark, catalog=qcat)
    i = fixtures.cap_regions(spark, catalog=icat)
    got = {
        (r["query_id"], r["region_id"])
        for r in cap_intersect_join_terms(q, i).collect()
    }
    assert got == {("pt", "around")}
