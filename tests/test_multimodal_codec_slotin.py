"""Codec slot-in contract: DECODERS is the one seam between the
engine's Arrow-batched media plumbing and a real media library.  This
suite swaps the fake image decoder for a genuine (pure-python) PNG
parser over real PNG byte streams and proves the batched interface —
(payload list) -> columnar dict, one call per (Arrow batch, modality)
— holds for a non-trivial codec with per-payload variable output.

Mirrors the reference's opaque-payload posture (media is bytes + typed
metadata; the engine never interprets payloads outside the decoder
seam).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from s2_geometry_rust_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def make_png(width: int, height: int, gray: int = 128) -> bytes:
    """Minimal but VALID grayscale PNG built from first principles
    (signature + IHDR + IDAT + IEND, real CRCs, real zlib stream)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.fixture
def png_decoder(monkeypatch):
    # The patched mapping ships to executors because extract_media_
    # features' nested closure captures DECODERS by value at plan-
    # pickle time, while decode_png_batch itself (a package-module
    # function) is pickled by importable reference.
    monkeypatch.setitem(mm.DECODERS, "image", mm.decode_png_batch)


def test_png_parser_roundtrip():
    p = make_png(17, 5, gray=200)
    out = mm.decode_png_batch([p, make_png(3, 9)], "image")
    assert list(out["width"]) == [17, 3]
    assert list(out["height"]) == [5, 9]
    assert out["features"][0] == pytest.approx([200 / 255.0] * 8)


def test_real_codec_slots_into_batched_pipeline(spark, png_decoder):
    """extract_media_features with a real PNG parser in the image slot:
    synthesized PNG payloads of varying dimensions flow through the
    same mapInPandas plan, and every (doc_id, span_idx) row reports the
    dimensions encoded in its own byte stream."""
    rows = []
    expect = {}
    rng = np.random.default_rng(42)
    for i in range(200):
        w = int(rng.integers(1, 256))
        h = int(rng.integers(1, 64))
        key = (f"doc-{i:04d}", i % 7)
        rows.append(
            (key[0], key[1], f"media://png/{i}", "image",
             bytearray(make_png(w, h, gray=i % 251)))
        )
        expect[key] = (w, h)
    spans = spark.createDataFrame(rows, mm.MEDIA_META_SCHEMA).repartition(8)

    got = mm.extract_media_features(spans).collect()
    assert len(got) == len(expect)
    for r in got:
        w, h = expect[(r["doc_id"], r["span_idx"])]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_frames"] == 1
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])


def test_mixed_modalities_route_to_distinct_decoders(spark, png_decoder):
    """Image rows hit the PNG parser while audio/video rows keep the
    fake decoder — one decoder call per (batch, modality) means a
    non-PNG audio payload in the same batch must NOT reach the PNG
    parser (it would raise)."""
    rows = [
        ("d0", 0, "media://a", "image", bytearray(make_png(10, 10))),
        ("d0", 1, "media://b", "audio", bytearray(b"not-a-png-stream")),
        ("d1", 0, "media://c", "video", bytearray(b"also-not-png")),
        ("d1", 1, "media://d", "image", bytearray(make_png(99, 7))),
    ]
    spans = spark.createDataFrame(rows, mm.MEDIA_META_SCHEMA).coalesce(1)
    got = {(r["doc_id"], r["span_idx"]): r
           for r in mm.extract_media_features(spans).collect()}
    assert (got[("d0", 0)]["width"], got[("d0", 0)]["height"]) == (10, 10)
    assert (got[("d1", 1)]["width"], got[("d1", 1)]["height"]) == (99, 7)
    assert got[("d0", 1)]["n_frames"] == len(b"not-a-png-stream")
    assert got[("d1", 0)]["n_frames"] == 16  # fake video decoder
