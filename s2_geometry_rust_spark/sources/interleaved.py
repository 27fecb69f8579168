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

import numpy as np
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


# precomputed span-string vocabulary: all nw^2 two-word pairs as Python
# str objects (fancy indexing = pointer gather), their lengths, and
# object-dtype scalars so np.where yields object arrays
_PAIRS = np.array(
    [
        f"{_WORDS[i % len(_WORDS)]} {_WORDS[(i // len(_WORDS)) % len(_WORDS)]}"
        for i in range(len(_WORDS) ** 2)
    ],
    dtype=object,
)
_PAIR_LENS = np.array([len(p) for p in _PAIRS], dtype=np.int64)
_S_TEXT = np.array("text", dtype=object)
_S_MEDIA = np.array("media", dtype=object)
_S_EMPTY = np.array("", dtype=object)
_HEX_ASCII = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_MEDIA_PREFIX = np.frombuffer(b"media://", dtype=np.uint8)


def _media_refs(vals: np.ndarray) -> np.ndarray:
    """``media://%010x`` for an int64 array in [0, 2^40), fully
    vectorized: hex digits gathered into a byte matrix, decoded to str
    in one C pass."""
    m = len(vals)
    full = np.empty((m, 18), dtype=np.uint8)
    full[:, :8] = _MEDIA_PREFIX
    shifts = np.arange(36, -4, -4, dtype=np.uint64)
    full[:, 8:] = _HEX_ASCII[
        (vals[:, None].astype(np.uint64) >> shifts[None, :]) & np.uint64(0xF)
    ]
    return full.reshape(-1).view("S18").astype("U18").astype(object)


def _spans_for_batch(ids: np.ndarray, seed: int) -> list[list[tuple]]:
    """Reference span builder (Python list-of-tuples form).  The
    production source is _synth_arrow_batch, which assembles the same
    spans directly as Arrow buffers; this form remains as the parity
    oracle for that builder (test_sources_interleaved) and for callers
    that want plain Python rows."""
    n = len(ids)
    n_spans = 1 + (_uniform(ids, 0, seed) * 8.0).astype(np.int64)  # 1..8
    geo_pos = (_uniform(ids, 1, seed) * n_spans).astype(np.int64)
    lat, lng = _sphere_latlng(ids, seed)
    nw = len(_WORDS)

    # (8, n) slot matrices.  All selection runs on object arrays
    # (pointer copies, C speed) — np.char.* would be per-element Python.
    kind_u = np.stack([_uniform(ids, 200 + j, seed) for j in range(8)])
    word_u = np.stack([_uniform(ids, 300 + j, seed) for j in range(8)])
    w = (word_u * (nw * nw)).astype(np.int64)
    word_pair = _PAIRS[w]                     # 625-entry lookup table
    media_ref = _media_refs(
        (word_u.ravel() * float(1 << 40)).astype(np.int64)
    ).reshape(8, n)
    is_text = kind_u < 0.6
    kind_m = np.where(is_text, _S_TEXT, _S_MEDIA)
    text_m = np.where(is_text, word_pair, _S_EMPTY)
    media_m = np.where(is_text, _S_EMPTY, media_ref)
    lens = np.where(is_text, _PAIR_LENS[w], 0)

    # geo override at each row's geo slot (repr = shortest round-trip;
    # one small Python call per ROW, not per span)
    geos = [
        f"POINT({float(a)!r} {float(b)!r})" for a, b in zip(lat, lng)
    ]
    cols = np.arange(n)
    kind_m[geo_pos, cols] = "geo"
    text_m[geo_pos, cols] = geos
    media_m[geo_pos, cols] = ""
    lens[geo_pos, cols] = [len(g) for g in geos]

    # offsets: exclusive running sum of max(len(text), 1) down the slots
    lens = np.maximum(lens, 1)
    offs = np.zeros_like(lens)
    np.cumsum(lens[:-1], axis=0, out=offs[1:])
    offs = offs.astype(object)

    return [
        list(zip(kind_m[:k, r], text_m[:k, r], media_m[:k, r], offs[:k, r]))
        for r, k in enumerate(n_spans)
    ]


def _doc_id_array(ids: np.ndarray) -> "pa.Array":
    """``doc-%08d`` utf8 array built from raw buffers (grows past 8
    digits exactly like the %08d format for ids >= 10^8): one scatter
    pass per digit position, zero Python strings."""
    import pyarrow as pa

    n = len(ids)
    nd = np.full(n, 8, dtype=np.int64)
    big = ids >= 10**8
    if big.any():
        nd[big] = np.floor(np.log10(ids[big].astype(np.float64))).astype(
            np.int64
        ) + 1
        # float log10 can under-read on exact powers of ten — fix up
        under = ids >= 10 ** nd
        while under.any():
            nd[under] += 1
            under = ids >= 10 ** nd
    widths = nd + 4
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(widths, out=offs[1:])
    vals = np.empty(int(offs[-1]), dtype=np.uint8)
    prefix = np.frombuffer(b"doc-", dtype=np.uint8)
    starts = offs[:-1].astype(np.int64)
    for c in range(4):
        vals[starts + c] = prefix[c]
    rem = ids.copy()
    for k in range(int(nd.max()) if n else 0):
        mask = nd > k
        pos = starts[mask] + 4 + nd[mask] - 1 - k
        vals[pos] = (rem[mask] % 10 + ord("0")).astype(np.uint8)
        rem = rem // 10
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offs.tobytes()),
                       pa.py_buffer(vals.tobytes())]
    )


def _synth_arrow_batch(ids: np.ndarray, seed: int) -> "pa.RecordBatch":
    """The synthesis kernel as a direct Arrow builder: every column of
    the ``list<struct>`` spans array is assembled from numpy buffers or
    dictionary codes — the only Python strings created are the per-ROW
    geo POINT reprs (shortest-round-trip formatting has no vectorized
    equivalent).  Output is element-for-element identical to
    _spans_for_batch (parity-tested); this path skips the
    pandas->Arrow conversion of ragged Python tuples that dominated the
    original mapInPandas source (~70% of synthesis wall time)."""
    import pyarrow as pa

    n = len(ids)
    nw = len(_WORDS)
    n_spans = 1 + (_uniform(ids, 0, seed) * 8.0).astype(np.int64)  # 1..8
    geo_pos = (_uniform(ids, 1, seed) * n_spans).astype(np.int64)
    lat, lng = _sphere_latlng(ids, seed)
    kind_u = np.stack([_uniform(ids, 200 + j, seed) for j in range(8)])
    word_u = np.stack([_uniform(ids, 300 + j, seed) for j in range(8)])
    w = (word_u * (nw * nw)).astype(np.int64)
    is_text = kind_u < 0.6

    # row-major (n, 8) slot views; flat mask selects each row's first
    # n_spans slots in row-major order (= span order within the doc)
    wT = w.T
    is_textT = is_text.T
    valid = np.arange(8)[None, :] < n_spans[:, None]
    geo_slot = np.arange(8)[None, :] == geo_pos[:, None]
    flat_mask = valid.ravel()

    # kind: dictionary codes 0=text 1=media 2=geo, decoded C-side
    kindc = np.where(is_textT, 0, 1)
    kindc = np.where(geo_slot, 2, kindc)
    kind_arr = pa.DictionaryArray.from_arrays(
        pa.array(kindc.ravel()[flat_mask].astype(np.int32)),
        pa.array(["text", "media", "geo"]),
    ).cast(pa.string())

    # text: dictionary = all word pairs + "" + this batch's geo strings
    geos = [f"POINT({float(a)!r} {float(b)!r})" for a, b in zip(lat, lng)]
    tc = np.where(is_textT, wT, nw * nw)
    tc = np.where(geo_slot, nw * nw + 1 + np.arange(n)[:, None], tc)
    text_arr = pa.DictionaryArray.from_arrays(
        pa.array(tc.ravel()[flat_mask].astype(np.int32)),
        pa.array(list(_PAIRS) + [""] + geos),
    ).cast(pa.string())

    # media_ref: "" except media slots (18-byte hex refs), raw buffers
    is_media_f = (~is_textT & ~geo_slot).ravel()[flat_mask]
    m_vals = (
        word_u.T.ravel()[flat_mask][is_media_f] * float(1 << 40)
    ).astype(np.int64)
    shifts = np.arange(36, -4, -4, dtype=np.uint64)
    hexmat = np.empty((len(m_vals), 18), dtype=np.uint8)
    hexmat[:, :8] = _MEDIA_PREFIX
    hexmat[:, 8:] = _HEX_ASCII[
        (m_vals[:, None].astype(np.uint64) >> shifts[None, :])
        & np.uint64(0xF)
    ]
    m_lens = np.where(is_media_f, 18, 0).astype(np.int32)
    m_offs = np.zeros(len(m_lens) + 1, dtype=np.int32)
    np.cumsum(m_lens, out=m_offs[1:])
    media_arr = pa.Array.from_buffers(
        pa.utf8(), len(m_lens),
        [None, pa.py_buffer(m_offs.tobytes()), pa.py_buffer(hexmat.tobytes())],
    )

    # offset: exclusive running sum of max(len(text), 1) across slots
    tlen = np.where(is_textT, _PAIR_LENS[wT], 0)
    geolens = np.fromiter((len(g) for g in geos), np.int64, count=n)
    tlen = np.where(geo_slot, geolens[:, None], tlen)
    tlen = np.maximum(tlen, 1)
    offs_in_doc = np.zeros_like(tlen)
    np.cumsum(tlen[:, :-1], axis=1, out=offs_in_doc[:, 1:])
    off_arr = pa.array(offs_in_doc.ravel()[flat_mask].astype(np.int32))

    struct = pa.StructArray.from_arrays(
        [kind_arr, text_arr, media_arr, off_arr],
        names=["kind", "text", "media_ref", "offset"],
    )
    row_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_spans, out=row_offs[1:])
    spans = pa.ListArray.from_arrays(pa.array(row_offs), struct)
    return pa.RecordBatch.from_arrays(
        [_doc_id_array(ids), spans], names=["doc_id", "spans"]
    )


def synth_documents(spark: SparkSession, n_docs: int, seed: int = 42,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic interleaved-documents table (direct
    Arrow builder via mapInArrow — no per-row Python objects)."""

    def gen(batches):
        for rb in batches:
            ids = rb.column("id").to_numpy().astype(np.int64)
            yield _synth_arrow_batch(ids, seed)

    # native range partitioning (contiguous id blocks) — NOT repartition:
    # a hash shuffle of the id column would be the only wide exchange in
    # the whole synthesis pipeline, and spans are a pure function of
    # (seed, doc_id) so placement is irrelevant to the output
    rng = (spark.range(0, n_docs, 1, partitions) if partitions
           else spark.range(n_docs))
    return rng.mapInArrow(gen, DOCUMENTS_SCHEMA)


def interleave_flat_documents(docs: DataFrame, seed: int = 42,
                              with_media: bool = False) -> DataFrame:
    """Convert the driver's flat documents table (doc_id:long, text, ...)
    into the interleaved schema: the text becomes a text span and a
    deterministic geo span (keyed by doc_id) is appended — used by the
    flagship entry() pipeline so the engine runs over driver testdata.

    with_media=True additionally appends a media span whose ref is the
    zero-padded hex of doc_id (``media://%010x``) — a pure function of
    the row an independent SQL engine can replay, used by the
    media_features contract query.

    Direct Arrow builder (mapInArrow): the incoming text column is
    reused as a dictionary slice without ever materializing Python
    strings; only the per-row geo reprs are Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = 3 if with_media else 2

    def gen(batches):
        for rb in batches:
            ids = rb.column("doc_id").to_numpy().astype(np.int64)
            texts = rb.column("text").cast(pa.string())
            if texts.null_count:
                texts = pc.fill_null(texts, "")
            n = len(ids)
            lat, lng = _sphere_latlng(ids, seed)
            geos = [
                f"POINT({float(a)!r} {float(b)!r})" for a, b in zip(lat, lng)
            ]
            # per-row span slots: (text, geo[, media]) — codes into the
            # concatenated dictionary [texts | geos | ""]
            text_dict = pa.concat_arrays([texts, pa.array(geos), pa.array([""])])
            codes = np.empty((n, k), dtype=np.int32)
            codes[:, 0] = np.arange(n)
            codes[:, 1] = n + np.arange(n)
            if with_media:
                codes[:, 2] = 2 * n
            text_arr = pa.DictionaryArray.from_arrays(
                pa.array(codes.ravel()), text_dict
            ).cast(pa.string())

            kindc = np.tile(np.arange(k, dtype=np.int32), n)
            kind_arr = pa.DictionaryArray.from_arrays(
                pa.array(kindc), pa.array(["text", "geo", "media"][:k])
            ).cast(pa.string())

            # media_ref: "" everywhere except the media slot (hex of id)
            m_lens = np.zeros((n, k), dtype=np.int32)
            if with_media:
                shifts = np.arange(36, -4, -4, dtype=np.uint64)
                hexmat = np.empty((n, 18), dtype=np.uint8)
                hexmat[:, :8] = _MEDIA_PREFIX
                hexmat[:, 8:] = _HEX_ASCII[
                    (ids[:, None].astype(np.uint64) >> shifts[None, :])
                    & np.uint64(0xF)
                ]
                m_lens[:, 2] = 18
                m_vals = hexmat.tobytes()
            else:
                m_vals = b""
            m_offs = np.zeros(n * k + 1, dtype=np.int32)
            np.cumsum(m_lens.ravel(), out=m_offs[1:])
            media_arr = pa.Array.from_buffers(
                pa.utf8(), n * k,
                [None, pa.py_buffer(m_offs.tobytes()), pa.py_buffer(m_vals)],
            )

            # offsets: 0, max(len(text),1), +len(geo) — character lengths
            tlen = np.maximum(pc.utf8_length(texts).to_numpy().astype(np.int64), 1)
            geolens = np.fromiter((len(g) for g in geos), np.int64, count=n)
            offs = np.zeros((n, k), dtype=np.int32)
            offs[:, 1] = tlen
            if with_media:
                offs[:, 2] = tlen + geolens
            struct = pa.StructArray.from_arrays(
                [kind_arr, text_arr, media_arr, pa.array(offs.ravel())],
                names=["kind", "text", "media_ref", "offset"],
            )
            row_offs = (np.arange(n + 1, dtype=np.int32) * k)
            spans = pa.ListArray.from_arrays(pa.array(row_offs), struct)
            yield pa.RecordBatch.from_arrays(
                [_doc_id_array(ids), spans], names=["doc_id", "spans"]
            )

    return docs.select("doc_id", "text").mapInArrow(gen, DOCUMENTS_SCHEMA)
