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


def media_spans(docs: DataFrame) -> DataFrame:
    """Explode media spans to (doc_id, span_idx, media_ref, modality,
    payload).  The payload here is a deterministic fake derived from the
    media_ref (stand-in for an object-store fetch)."""
    s = docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
    s = s.filter(F.col("span.kind") == "media").select(
        "doc_id",
        "span_idx",
        F.col("span.media_ref").alias("media_ref"),
    )
    modality = (
        F.when(F.xxhash64("media_ref") % 3 == 0, "image")
        .when(F.xxhash64("media_ref") % 3 == 1, "audio")
        .otherwise("video")
    )
    # fake payload: utf-8 bytes of the ref (deterministic, small)
    return s.withColumn("modality", modality).withColumn(
        "payload", F.encode("media_ref", "utf-8")
    )


def _fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in decoder.

    Real implementation: PIL.Image.open / soundfile.read / pyav frame
    sampling.  Raises nothing here so the pipeline shape is testable;
    a real deployment replaces DECODERS[modality].
    """
    h = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    rng_like = (h.cumsum() % 251.0) / 251.0
    base = rng_like[:8] if len(rng_like) >= 8 else np.pad(rng_like, (0, 8 - len(rng_like)))
    if modality == "image":
        return {"width": 64, "height": 64, "n_frames": 1, "features": base}
    if modality == "audio":
        return {"width": 0, "height": 0, "n_frames": int(len(h)), "features": base}
    return {"width": 32, "height": 32, "n_frames": 16, "features": base}


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def extract_media_features(spans: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-modality
    vectorizable, no shuffle (runs in place on the span partitions)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "doc_id": [], "span_idx": [], "modality": [],
                "width": [], "height": [], "n_frames": [], "features": [],
            }
            for _, row in b.iterrows():
                dec = DECODERS[row["modality"]](row["payload"], row["modality"])
                out["doc_id"].append(row["doc_id"])
                out["span_idx"].append(row["span_idx"])
                out["modality"].append(row["modality"])
                out["width"].append(dec["width"])
                out["height"].append(dec["height"])
                out["n_frames"].append(dec["n_frames"])
                out["features"].append(np.asarray(dec["features"], np.float64))
            yield pd.DataFrame(out)

    return spans.mapInPandas(run, FEATURE_SCHEMA)
