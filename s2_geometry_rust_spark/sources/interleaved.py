"""Deterministic synthesis of the interleaved text+media documents table.

Schema per BASELINE.json ``input_hint`` / FIXTURES.md §1:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Geo coordinates are embedded in ``kind='geo'`` spans as
``POINT(<lat> <lng>)`` with full f64 repr (shortest round-trip — both
Spark's and DuckDB's string->double parse are correctly rounded, so the
value survives exactly).

Determinism: every random draw is a pure function of (seed, doc_id) via
a splitmix64-style counter hash — independent of partitioning, executor
count, or evaluation order, so the same doc_id always gets the same
spans at any scale.  Generation is distributed: ``spark.range(n)`` ->
``mapInPandas`` (Arrow-batched; the only per-row Python is the ragged
array assembly of this synthetic *input*, never engine operators).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_SCHEMA)),
    ]
)

_WORDS = np.array(
    "the a spark table row scan filter join agg tile cell cover point "
    "region query batch stream index range hilbert face level token".split()
)

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + _GOLDEN
        x = (x ^ (x >> np.uint64(30))) * _M1
        x = (x ^ (x >> np.uint64(27))) * _M2
        return x ^ (x >> np.uint64(31))


def _uniform(doc_ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic uniform [0,1) per doc_id for a given stream index."""
    with np.errstate(over="ignore"):
        key = (
            doc_ids.astype(np.uint64) * np.uint64(0x100000001B3)
            + np.uint64(stream) * np.uint64(0x1000193)
            + np.uint64(seed)
        )
    return (_splitmix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _sphere_latlng(doc_ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Uniform point on the sphere via the normal-deviate method
    (mirrors random_point_on_sphere in the reference's seeded tests,
    /root/reference/tests/test_s2cell_id_port.rs:372-378), built from
    Box-Muller over counter-hash uniforms."""
    u = [np.clip(_uniform(doc_ids, 100 + k, seed), 1e-300, None) for k in range(4)]
    g0 = np.sqrt(-2.0 * np.log(u[0])) * np.cos(2.0 * np.pi * u[1])
    g1 = np.sqrt(-2.0 * np.log(u[0])) * np.sin(2.0 * np.pi * u[1])
    g2 = np.sqrt(-2.0 * np.log(u[2])) * np.cos(2.0 * np.pi * u[3])
    n = np.sqrt(g0 * g0 + g1 * g1 + g2 * g2)
    n = np.where(n == 0.0, 1.0, n)
    x, y, z = g0 / n, g1 / n, g2 / n
    lat = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def _spans_for_batch(ids: np.ndarray, seed: int) -> list[list[tuple]]:
    n_spans = 1 + (_uniform(ids, 0, seed) * 8.0).astype(np.int64)  # 1..8
    geo_pos = (_uniform(ids, 1, seed) * n_spans).astype(np.int64)
    lat, lng = _sphere_latlng(ids, seed)
    kind_u = [_uniform(ids, 200 + j, seed) for j in range(8)]
    word_u = [_uniform(ids, 300 + j, seed) for j in range(8)]

    out = []
    for r in range(len(ids)):
        spans = []
        offset = 0
        for j in range(int(n_spans[r])):
            if j == int(geo_pos[r]):
                kind = "geo"
                text = f"POINT({float(lat[r])!r} {float(lng[r])!r})"
                media = ""
            elif kind_u[j][r] < 0.6:
                kind = "text"
                w = int(word_u[j][r] * len(_WORDS) ** 2)
                text = f"{_WORDS[w % len(_WORDS)]} {_WORDS[w // len(_WORDS) % len(_WORDS)]}"
                media = ""
            else:
                kind = "media"
                text = ""
                media = f"media://{int(word_u[j][r] * (1 << 40)):010x}"
            spans.append((kind, text, media, offset))
            offset += max(len(text), 1)
        out.append(spans)
    return out


def synth_documents(spark: SparkSession, n_docs: int, seed: int = 42,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic interleaved-documents table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": [f"doc-{i:08d}" for i in ids],
                    "spans": _spans_for_batch(ids, seed),
                }
            )

    # native range partitioning (contiguous id blocks) — NOT repartition:
    # a hash shuffle of the id column would be the only wide exchange in
    # the whole synthesis pipeline, and spans are a pure function of
    # (seed, doc_id) so placement is irrelevant to the output
    rng = (spark.range(0, n_docs, 1, partitions) if partitions
           else spark.range(n_docs))
    return rng.mapInPandas(gen, DOCUMENTS_SCHEMA)


def interleave_flat_documents(docs: DataFrame, seed: int = 42,
                              with_media: bool = False) -> DataFrame:
    """Convert the driver's flat documents table (doc_id:long, text, ...)
    into the interleaved schema: the text becomes a text span and a
    deterministic geo span (keyed by doc_id) is appended — used by the
    flagship entry() pipeline so the engine runs over driver testdata.

    with_media=True additionally appends a media span whose ref is the
    zero-padded hex of doc_id (``media://%010x``) — a pure function of
    the row an independent SQL engine can replay, used by the
    media_features contract query."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["doc_id"].to_numpy(dtype=np.int64)
            lat, lng = _sphere_latlng(ids, seed)
            texts = b["text"].astype(str).to_numpy()
            spans = []
            for r in range(len(ids)):
                geo = f"POINT({float(lat[r])!r} {float(lng[r])!r})"
                o1 = max(len(texts[r]), 1)
                row = [
                    ("text", texts[r], "", 0),
                    ("geo", geo, "", o1),
                ]
                if with_media:
                    row.append(
                        ("media", "", f"media://{int(ids[r]):010x}",
                         o1 + len(geo))
                    )
                spans.append(row)
            yield pd.DataFrame(
                {"doc_id": [f"doc-{i:08d}" for i in ids], "spans": spans}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, DOCUMENTS_SCHEMA)
