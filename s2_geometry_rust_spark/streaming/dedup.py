"""Streaming deduplication: exact content dedup over a live document
feed with watermark-bounded state.

Batch dedup (operators/dedup.py) answers "what are the duplicate
groups in this corpus"; a live ingest pipeline instead needs "is this
incoming doc a duplicate of anything recent" — per-key state with a
TTL so the state store doesn't grow with the full corpus.  Spark's
``dropDuplicatesWithinWatermark`` is exactly that operator: the first
arrival per key is emitted, later arrivals within the watermark bound
are dropped, and state older than the watermark is evicted.

At scale: state is hash-partitioned by key across executors (same
shuffle shape as a groupBy), size is bounded by
(unique keys per watermark window), not corpus size.  For full-history
exact dedup, run the batch exact_dedup over the accumulated sink
instead — the two share the same md5 key definition, so a streaming
survivor set can be reconciled against the batch keeper set exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(doc_stream: DataFrame,
                          ts_col: str = "event_time",
                          watermark: str = "10 minutes",
                          text_col: str = "text") -> DataFrame:
    """First-seen document per content hash within the watermark bound.

    Input: streaming DF with at least (text_col, ts_col).  Output: the
    input rows that survive dedup, plus the ``text_md5`` key column.
    Emits in append mode; state is evicted after ``watermark``.
    """
    s = doc_stream.withColumn("text_md5", F.md5(F.col(text_col)))
    s = s.withWatermark(ts_col, watermark)
    return s.dropDuplicatesWithinWatermark(["text_md5"])


def streaming_simhash_dedup(doc_stream: DataFrame,
                            ts_col: str = "event_time",
                            watermark: str = "10 minutes",
                            text_col: str = "text") -> DataFrame:
    """Near-dup variant: dedup on the 64-bit SimHash of the document
    (identical simhash ⇒ near-identical token multiset).  The simhash
    is computed by the same Arrow-batched kernel as the batch operator
    (operators/dedup.simhash_signatures semantics) but expressed via
    mapInPandas on the stream — per-batch, stateless — followed by the
    same watermark-bounded key dedup."""
    from ..operators.dedup import _hash_words_batch

    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(doc_stream.schema.fields) + [StructField("simhash", LongType())]
    )

    def add_simhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitcols = np.arange(64, dtype=np.uint64)
        for b in batches:
            docs_words = [s.split() for s in b[text_col].astype(str)]
            hashed = _hash_words_batch(docs_words)
            lens = np.fromiter(
                (len(h) for h in hashed), np.int64, count=len(hashed)
            )
            out = np.zeros(len(b), dtype=np.uint64)
            nonempty = np.nonzero(lens > 0)[0]
            if len(nonempty):
                flat = np.concatenate([hashed[i] for i in nonempty])
                bits = (flat[:, None] >> bitcols[None, :]) & np.uint64(1)
                offs = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
                sums = np.add.reduceat(bits.astype(np.int64), offs, axis=0)
                votes = sums * 2 - lens[nonempty][:, None]
                out[nonempty] = (
                    (votes > 0).astype(np.uint64) << bitcols[None, :]
                ).sum(axis=1)
            b = b.copy()
            b["simhash"] = out.view(np.int64)
            yield b

    s = doc_stream.mapInPandas(add_simhash, out_schema)
    s = s.withWatermark(ts_col, watermark)
    return s.dropDuplicatesWithinWatermark(["simhash"])


def streaming_corpus_filter(doc_stream: DataFrame, quality_min: float = 0.5,
                            langs: tuple[str, ...] = ("en",),
                            ts_col: str = "event_time",
                            watermark: str = "10 minutes",
                            text_col: str = "text") -> DataFrame:
    """The live-ingest twin of operators/corpus.build_training_corpus:
    quality gate + language gate (stateless, identical column
    definitions to the batch operator) then watermark-bounded exact
    dedup — first arrival per content hash survives.

    Near-dup clustering is inherently corpus-global (connected
    components) and stays a batch job over the accumulated sink; this
    stream applies every gate that is decidable per document or per
    watermark window.  Output rows carry the same metadata columns as
    the batch corpus (n_tokens, quality_score, lang_pred, text_md5).
    """
    from ..operators.text import with_lang_id, with_quality_score

    scored = with_lang_id(with_quality_score(doc_stream))
    gated = scored.filter(
        (F.col("quality_score") >= quality_min)
        & F.col("lang_pred").isin(*langs)
    )
    gated = gated.withColumn("text_md5", F.md5(F.col(text_col)))
    gated = gated.withWatermark(ts_col, watermark)
    return gated.dropDuplicatesWithinWatermark(["text_md5"])
