"""Multimodal span processing: image/audio/video payloads as opaque
binary columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition-safe
mapInPandas signatures) is real and tested; the codec kernels are
deterministic fakes behind ``DECODERS`` because media libraries are not
available in this container — swap the fake with a real
PIL/librosa/ffmpeg call per modality and nothing else changes.

Contract: one row per media span, keyed (doc_id, span_idx) so results
re-join to documents without disturbing span order (the span-sequence
invariant applies: downstream joins never rewrite the spans column).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


_MODALITIES = np.array(["image", "audio", "video"])


def media_spans(docs: DataFrame) -> DataFrame:
    """Explode media spans to (doc_id, span_idx, media_ref, modality,
    payload).  The payload here is a deterministic fake derived from the
    media_ref (stand-in for an object-store fetch).

    Modality routing is FNV-1a(media_ref) mod 3: process-stable AND
    replayable by an independent SQL engine (the media_features contract
    query verifies the full explode->route->decode pipeline against a
    DuckDB oracle; Spark's xxhash64 has no SQL-standard equivalent).
    The hash runs vectorized in the same Arrow pass that every batch
    already takes through the decoder."""
    from .dedup import _fnv1a_bytes

    s = docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
    s = s.filter(F.col("span.kind") == "media").select(
        "doc_id",
        "span_idx",
        F.col("span.media_ref").alias("media_ref"),
    )

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            h = np.fromiter(
                (_fnv1a_bytes(r.encode("utf-8")) for r in b["media_ref"]),
                dtype=np.uint64, count=len(b),
            )
            b = b.copy()
            b["modality"] = _MODALITIES[(h % np.uint64(3)).astype(np.int64)]
            yield b

    routed_schema = StructType(
        [f for f in MEDIA_META_SCHEMA.fields if f.name != "payload"]
    )
    s = s.mapInPandas(route, routed_schema)
    # fake payload: utf-8 bytes of the ref (deterministic, small)
    return s.withColumn("payload", F.encode("media_ref", "utf-8"))


def _feature_vec(payload: bytes) -> np.ndarray:
    """8-dim fake feature: the tail of the byte-cumsum walk, so the
    vector depends on the whole payload (the head would see only the
    shared 'media://' prefix)."""
    h = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    rng_like = (h.cumsum() % 251.0) / 251.0
    if len(rng_like) >= 8:
        return rng_like[-8:]
    return np.pad(rng_like, (0, 8 - len(rng_like)))


def _fake_decode_batch(payloads: list[bytes], modality: str) -> dict:
    """Deterministic stand-in BATCH decoder: one call per (Arrow batch,
    modality), columnar output — the shape a real vectorized codec
    (PIL batched open / torchaudio batch load / pyav frame sampling)
    slots into.  A real deployment replaces DECODERS[modality] with a
    function of the same (payload list) -> columnar dict contract.
    """
    n = len(payloads)
    feats = [_feature_vec(p) for p in payloads]
    if modality == "image":
        return {"width": np.full(n, 64), "height": np.full(n, 64),
                "n_frames": np.full(n, 1), "features": feats}
    if modality == "audio":
        lens = np.fromiter((len(p) for p in payloads), np.int64, count=n)
        return {"width": np.zeros(n, np.int64), "height": np.zeros(n, np.int64),
                "n_frames": lens, "features": feats}
    return {"width": np.full(n, 32), "height": np.full(n, 32),
            "n_frames": np.full(n, 16), "features": feats}


def decode_png_batch(payloads: list[bytes], modality: str) -> dict:
    """Real (pure-python stdlib) PNG codec honoring the DECODERS
    contract — proof the seam fits a genuine parser, and an importable
    target executors can unpickle (a decoder defined in driver-only
    code cannot be resolved by Spark's Python workers).

    Parses each payload's IHDR for (width, height), walks chunks to the
    IDAT zlib stream, and averages pixel rows into the 8-dim feature
    slot.  Swap in for DECODERS["image"] when payloads are real PNGs.
    """
    import struct
    import zlib

    n = len(payloads)
    widths = np.empty(n, np.int64)
    heights = np.empty(n, np.int64)
    feats = []
    for i, p in enumerate(payloads):
        p = bytes(p)
        if p[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("payload is not a PNG stream")
        length, tag = struct.unpack(">I4s", p[8:16])
        if tag != b"IHDR" or length != 13:
            raise ValueError("malformed PNG: IHDR not first chunk")
        w, h = struct.unpack(">II", p[16:24])
        widths[i], heights[i] = w, h
        off, idat = 16 + length + 4, b""
        while off < len(p):
            ln, tg = struct.unpack(">I4s", p[off:off + 8])
            if tg == b"IDAT":
                idat += p[off + 8:off + 8 + ln]
            if tg == b"IEND":
                break
            off += 12 + ln
        # grayscale 8-bit rows are (filter byte + w pixels) each
        pix = np.frombuffer(zlib.decompress(idat), np.uint8)
        pix = pix.reshape(h, w + 1)[:, 1:]
        feats.append(np.resize(pix.mean(axis=1) / 255.0, 8))
    return {
        "width": widths,
        "height": heights,
        "n_frames": np.ones(n, np.int64),
        "features": feats,
    }


DECODERS = {
    "image": _fake_decode_batch,
    "audio": _fake_decode_batch,
    "video": _fake_decode_batch,
}


def extract_media_features(spans: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one decoder call
    per (batch, modality) — no per-row Python dispatch — and no shuffle
    (runs in place on the span partitions)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            parts = []
            for modality, idx in b.groupby("modality").indices.items():
                sub = b.iloc[idx]
                dec = DECODERS[modality](list(sub["payload"]), modality)
                parts.append(pd.DataFrame(
                    {
                        "doc_id": sub["doc_id"].to_numpy(),
                        "span_idx": sub["span_idx"].to_numpy(),
                        "modality": modality,
                        "width": np.asarray(dec["width"], np.int64),
                        "height": np.asarray(dec["height"], np.int64),
                        "n_frames": np.asarray(dec["n_frames"], np.int64),
                        "features": dec["features"],
                    }
                ))
            yield pd.concat(parts, ignore_index=True)

    return spans.mapInPandas(run, FEATURE_SCHEMA)
