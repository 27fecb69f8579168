"""Interleaved-document source: determinism, span invariant, geo
extraction parity with the numpy kernels (M0 end-to-end slice)."""

import numpy as np

from pyspark.sql import functions as F

from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.kernels import latlng as lk
from s2_geometry_rust_spark.operators.tiling import tile_counts
from s2_geometry_rust_spark.sources import (
    extract_geo_points,
    interleave_flat_documents,
    synth_documents,
    verify_span_sequence,
)


def test_synth_documents_deterministic_across_partitioning(spark):
    a = synth_documents(spark, 200, seed=42, partitions=1).toPandas()
    b = synth_documents(spark, 200, seed=42, partitions=7).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    for ra, rb in zip(a["spans"], b["spans"]):
        assert list(ra) == list(rb)


def test_every_doc_has_exactly_one_geo_span_and_monotone_offsets(spark):
    docs = synth_documents(spark, 300, seed=42).toPandas()
    for spans in docs["spans"]:
        kinds = [s["kind"] for s in spans]
        assert kinds.count("geo") == 1
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        assert len(spans) >= 1 and len(spans) <= 8


def test_extract_geo_points_matches_kernel_bit_for_bit(spark):
    docs = synth_documents(spark, 500, seed=42)
    pts = extract_geo_points(docs).toPandas().sort_values("doc_id")
    lat_r = lk.degrees_to_radians(pts["lat"].to_numpy())
    lng_r = lk.degrees_to_radians(pts["lng"].to_numpy())
    x, y, z = lk.latlng_to_xyz(lat_r, lng_r)
    want = ck.from_point(x, y, z)
    got = pts["cell_id"].to_numpy(np.int64).view(np.uint64)
    np.testing.assert_array_equal(got, want)
    assert ck.is_leaf(got).all() and ck.is_valid(got).all()
    assert len(pts) == 500  # one geo span per doc


def test_span_sequence_invariant_through_pipeline(spark):
    docs = synth_documents(spark, 200, seed=42)
    pts = extract_geo_points(docs)
    # engine output: docs enriched with their tile — spans untouched
    out = docs.join(
        pts.select("doc_id", "cell_id"), "doc_id", "left"
    ).select("doc_id", "spans")
    assert verify_span_sequence(docs, out) == 0
    # negative control: corrupt one span kind
    bad = docs.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> named_struct("
            "'kind', CASE WHEN s.offset = 0 THEN 'media' ELSE s.kind END,"
            "'text', s.text, 'media_ref', s.media_ref, 'offset', s.offset))"
        ),
    )
    assert verify_span_sequence(docs, bad) > 0


def test_tile_counts_end_to_end(spark):
    docs = synth_documents(spark, 400, seed=42)
    pts = extract_geo_points(docs)
    tiles = tile_counts(pts, 5).toPandas()
    assert tiles["n_points"].sum() == 400
    ids = tiles["tile_id"].to_numpy(np.int64).view(np.uint64)
    assert (ck.level(ids) == 5).all()
    # Hilbert order
    keys = ids.astype(np.uint64)
    assert (np.diff(keys.astype(np.float64)) >= 0).all() or (
        np.all(np.sort(keys) == keys)
    )


def test_interleave_flat_documents_from_testdata(spark, sf_dir):
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = interleave_flat_documents(flat)
    n = flat.count()
    pts = extract_geo_points(docs)
    assert pts.count() == n
    assert verify_span_sequence(docs, docs.select("doc_id", "spans")) == 0


def test_arrow_builder_matches_reference_spans():
    """_synth_arrow_batch (production Arrow-buffer source) must be
    element-for-element identical to the reference Python span builder,
    including big ids whose doc-id grows past 8 digits."""
    import numpy as np

    from s2_geometry_rust_spark.sources.interleaved import (
        _spans_for_batch,
        _synth_arrow_batch,
    )

    ids = np.concatenate(
        [
            np.arange(0, 3000, dtype=np.int64),
            np.array(
                [10**8 - 1, 10**8, 10**9, 10**10, 123456789012],
                dtype=np.int64,
            ),
        ]
    )
    rb = _synth_arrow_batch(ids, 42)
    want = _spans_for_batch(ids, 42)
    got = rb.to_pylist()
    assert len(got) == len(want)
    for r, row in enumerate(got):
        assert row["doc_id"] == f"doc-{ids[r]:08d}"
        exp = [
            {"kind": str(k), "text": str(t), "media_ref": str(m),
             "offset": int(o)}
            for k, t, m, o in want[r]
        ]
        assert row["spans"] == exp


def test_interleave_flat_arrow_builder_spans(spark):
    """interleave_flat_documents' Arrow path: spans mirror the
    documented layout (text@0, geo@max(len,1), media@+len(geo))."""
    rows = [(7, "hello world"), (8, ""), (123456789, "x")]
    flat = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["spans"]
        for r in interleave_flat_documents(flat, with_media=True).collect()
    }
    s7 = out["doc-00000007"]
    assert [x["kind"] for x in s7] == ["text", "geo", "media"]
    assert s7[0]["text"] == "hello world" and s7[0]["offset"] == 0
    assert s7[1]["text"].startswith("POINT(") and s7[1]["offset"] == 11
    assert s7[2]["media_ref"] == f"media://{7:010x}"
    assert s7[2]["offset"] == 11 + len(s7[1]["text"])
    s8 = out["doc-00000008"]
    assert s8[1]["offset"] == 1  # max(len(''), 1)
    assert "doc-123456789" in out  # 9-digit id formats like %08d
