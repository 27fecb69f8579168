"""resize_images / sample_frames: the two remaining multimodal
checklist ops — semantics of the deterministic kernels, and the real
PNG resize slotting into the same batched seam."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

import s2_geometry_rust_spark.operators.multimodal as mm


def make_png_gradient(width: int, height: int) -> bytes:
    """Grayscale-8 PNG whose pixel (r, c) = (r * 7 + c * 3) % 256."""
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    hdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = b"".join(
        b"\x00" + bytes((r * 7 + c * 3) % 256 for c in range(width))
        for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", hdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )


def test_fake_resize_nearest_neighbor_math():
    payload = b"media://00000000ff"
    pix = mm._fake_pixels(payload)
    s = sum(payload)
    assert pix[0, 0] == s % 251
    assert pix[2, 3] == (s + 31 * 2 + 17 * 3) % 251
    r = mm._fake_resize_batch([payload], 16, 16)[0]
    # NN mapping: out (i, j) <- src (4i, 4j) for 64 -> 16
    assert r[5, 7] == pix[20, 28]
    assert r.shape == (16, 16)


def test_real_png_resize_batch_pixel_exact():
    png = make_png_gradient(20, 12)
    out = mm.resize_png_batch([png], 6, 10)[0]
    src = np.array(
        [[(r * 7 + c * 3) % 256 for c in range(20)] for r in range(12)],
        dtype=np.int64,
    )
    ri = (np.arange(6) * 12) // 6
    ci = (np.arange(10) * 20) // 10
    assert (out == src[np.ix_(ri, ci)]).all()


def test_real_png_resize_slots_into_pipeline(spark, monkeypatch):
    """Swap RESIZERS['image'] for the real PNG kernel and run the full
    Spark resize over constructed PNG payloads: row sums must equal
    the numpy NN resize of the known gradient."""
    monkeypatch.setitem(mm.RESIZERS, "image", mm.resize_png_batch)
    rows = [("doc-a", 2, "x", "image", bytearray(make_png_gradient(64, 64))),
            ("doc-b", 2, "y", "image", bytearray(make_png_gradient(64, 64)))]
    spans = spark.createDataFrame(
        rows,
        "doc_id string, span_idx int, media_ref string, modality string,"
        " payload binary",
    )
    got = mm.resize_images(spans, out_h=8, out_w=8).collect()
    src = np.array(
        [[(r * 7 + c * 3) % 256 for c in range(64)] for r in range(64)],
        dtype=np.int64,
    )
    ri = (np.arange(8) * 64) // 8
    want = src[np.ix_(ri, ri)].sum(axis=1)
    assert len(got) == 16
    for row in got:
        assert row["row_sum"] == want[row["row_idx"]]
        assert row["row_mean"] == want[row["row_idx"]] / 8.0


def test_sample_frames_semantics(spark):
    spans = spark.createDataFrame(
        [("doc-a", 2, "ref", "video", bytearray(b"abc")),
         ("doc-b", 2, "ref", "image", bytearray(b"zzz"))],
        "doc_id string, span_idx int, media_ref string, modality string,"
        " payload binary",
    )
    got = mm.sample_frames(spans, every_k=4, n_frames=16).collect()
    # image span filtered out; video emits frames 0, 4, 8, 12
    assert {r["doc_id"] for r in got} == {"doc-a"}
    assert sorted(r["frame_idx"] for r in got) == [0, 4, 8, 12]
    s = sum(b"abc")
    for r in got:
        assert r["frame_value"] == (7 * s + 13 * r["frame_idx"]) % 251
        assert r["frame_feature"] == r["frame_value"] / 251.0


def make_wav(n_frames: int, freq_step: int = 37) -> bytes:
    """16-bit mono PCM WAV with sample[i] = ((i * freq_step) % 2000) - 1000."""
    import io
    import wave

    samples = (
        (np.arange(n_frames, dtype=np.int64) * freq_step) % 2000 - 1000
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_real_wav_decoder_honors_contract():
    wav = make_wav(800)
    out = mm.decode_wav_batch([wav, make_wav(8)], "audio")
    assert list(out["n_frames"]) == [800, 8]
    samples = ((np.arange(800, dtype=np.int64) * 37) % 2000 - 1000)
    amp = np.abs(samples.astype(np.float64)) / 32768.0
    want0 = amp[0:100].mean()
    assert out["features"][0][0] == want0
    assert len(out["features"][0]) == 8


def test_real_wav_decoder_slots_into_pipeline(spark, monkeypatch):
    """Swap DECODERS['audio'] for the real WAV codec and run the full
    batched feature pipeline over constructed WAV payloads."""
    monkeypatch.setitem(mm.DECODERS, "audio", mm.decode_wav_batch)
    rows = [("doc-a", 2, "r1", "audio", bytearray(make_wav(160))),
            ("doc-b", 2, "r2", "audio", bytearray(make_wav(320)))]
    spans = spark.createDataFrame(
        rows,
        "doc_id string, span_idx int, media_ref string, modality string,"
        " payload binary",
    )
    got = {r["doc_id"]: r
           for r in mm.extract_media_features(spans).collect()}
    assert got["doc-a"]["n_frames"] == 160
    assert got["doc-b"]["n_frames"] == 320
    ref = mm.decode_wav_batch([make_wav(160)], "audio")["features"][0]
    assert np.allclose(got["doc-a"]["features"], ref, atol=0, rtol=0)


def test_native_codec_binding_or_documented_absence(monkeypatch):
    """use_native_codecs() binds the Pillow-backed codec when Pillow is
    importable, and is a clean False no-op otherwise (this sandbox has
    no Pillow — dated note in multimodal.py)."""
    before = dict(mm.DECODERS), dict(mm.RESIZERS)
    bound = mm.use_native_codecs()
    try:
        if not bound:
            assert (dict(mm.DECODERS), dict(mm.RESIZERS)) == before
            return
        # Pillow present: native path must be pixel/byte-exact vs the
        # stdlib proofs on filter-0 grayscale PNGs
        pngs = [make_png_gradient(w, h) for (w, h) in
                [(16, 16), (64, 48), (7, 9)]]
        dn = mm.decode_png_batch_native(pngs, "image")
        ds = mm.decode_png_batch(pngs, "image")
        assert (dn["width"] == ds["width"]).all()
        assert (dn["height"] == ds["height"]).all()
        for a, b in zip(dn["features"], ds["features"]):
            assert (a == b).all()
        rn = mm.resize_png_batch_native(pngs, 6, 10)
        rs = mm.resize_png_batch(pngs, 6, 10)
        for a, b in zip(rn, rs):
            assert (a == b).all()
    finally:
        mm.DECODERS.update(before[0])
        mm.RESIZERS.update(before[1])
