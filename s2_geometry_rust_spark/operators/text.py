"""Text analysis for training-data pipelines over the documents table:
token counting, quality scoring, language ID, and document
fingerprinting.  Everything here is either pure JVM (codegen,
oracle-checkable in SQL) or a vectorized pandas UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Tiny stopword lists per language for the n-gram/stopword heuristic.
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "los", "y"],
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def with_token_count(docs: DataFrame, text_col: str = "text",
                     out_col: str = "n_tokens") -> DataFrame:
    """Whitespace tokenization: count of non-empty whitespace-separated
    tokens — JVM split + filter, SQL-expressible."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return docs.withColumn(out_col, F.size(toks))


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword heuristics (all codegen):
    n_chars, n_tokens, avg token length, stopword ratio, punct ratio,
    and a combined [0,1] quality score."""
    t = F.col(text_col)
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    avg_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    quality = (
        F.least(n_tokens.cast("double") / 32.0, F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.2
    )
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_calc", n_chars)
        .withColumn("avg_token_len", avg_tok)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("quality_score", quality)
    )


def with_lang_id(docs: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: argmax of per-language marker hits,
    'und' (undetermined) when nothing matches.  Pure JVM."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")

    def _marker_count(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        _marker_count(markers).alias(lang)
        for lang, markers in _LANG_MARKERS.items()
    ]
    df = docs.withColumn("_scores", F.struct(*scores))
    best = F.greatest(*[F.col(f"_scores.{lg}") for lg in _LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in _LANG_MARKERS:  # first max wins, deterministic order
        pred = pred.when(F.col(f"_scores.{lg}") == best, F.lit(lg))
    return df.withColumn(out_col, pred).drop("_scores")


_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fingerprint", LongType()),
    ]
)


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """64-bit rolling polynomial hash of the whole document (Rabin
    style, base 257 mod 2^64) — vectorized per batch with numpy."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.uint64(257)
        seed = np.uint64(1469598103934665603)
        pow_cache = np.empty(0, dtype=np.uint64)

        def powers(n: int) -> np.ndarray:
            nonlocal pow_cache
            if len(pow_cache) < n:
                with np.errstate(over="ignore"):
                    pow_cache = np.concatenate(
                        [np.ones(1, np.uint64),
                         np.cumprod(np.full(max(n, 1024) - 1, base, np.uint64))]
                    )
            return pow_cache[:n]

        for b in batches:
            out = np.zeros(len(b), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for r, s in enumerate(b[text_col].astype(str)):
                    arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(
                        np.uint64
                    )
                    n = len(arr)
                    # h = seed*base^n + sum(byte_i * base^(n-1-i)) mod 2^64
                    p = powers(n + 1)
                    out[r] = seed * p[n] + np.sum(arr * p[:n][::-1])
            yield pd.DataFrame(
                {"doc_id": b[id_col].to_numpy(np.int64), "fingerprint": out.view(np.int64)}
            )

    return docs.select(id_col, text_col).mapInPandas(fp, _FP_SCHEMA)


def with_repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (engine addition — no
    reference counterpart; standard training-corpus filters): per-doc
    token count, distinct-token count, repetition ratio
    (1 - distinct/total) and most-common-token fraction.

    Scale shape: zero shuffle — everything is per-row array math in
    whole-stage codegen.  The mode count is a linear scan over the
    sorted token array via ``F.aggregate`` (longest equal run), NOT an
    explode + groupBy(doc, word), which would shuffle ~n_tokens rows
    per document at 100 TB for a purely row-local statistic.

    Ratios are emitted nano-scaled (round(r*1e9) as long) so the DuckDB
    oracle comparison is exact under hash compare.
    """
    t = F.col(text_col)
    # materialize the token array once: the aggregate below is
    # CodegenFallback, so the whole projection is interpreted with no
    # common-subexpression elimination — referencing the split/lower
    # chain from every output column would re-tokenize per column
    docs = docs.withColumn(
        "_toks", F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    )
    toks = F.col("_toks")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    srt = F.array_sort(toks)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(a, w):
        run = F.when(w == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            w.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    top_n = F.aggregate(srt, acc0, step, lambda a: a["best"])

    def nano_ratio(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double") * 1e9, 0)
        ).otherwise(F.lit(0.0)).cast("long")

    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("n_distinct_tokens", n_distinct)
        .withColumn("top_token_count", top_n)
        .withColumn(
            "repetition_nano", nano_ratio(n_tokens - n_distinct, n_tokens)
        )
        .withColumn("top_token_frac_nano", nano_ratio(top_n, n_tokens))
        .drop("_toks")
    )


# GPT-2-style pre-tokenizer pattern, restricted to RE2-compatible
# constructs (no lookahead) so the same pattern runs in Java regex
# (Spark codegen) and RE2 (DuckDB oracle) with identical leftmost-first
# alternation semantics.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def with_bpe_token_count(docs: DataFrame, text_col: str = "text",
                         out_col: str = "n_bpe_tokens") -> DataFrame:
    """Subword-style token counting: the GPT-2 pre-tokenization regex
    (contractions / letter runs / digit runs / punctuation runs /
    whitespace, each optionally space-prefixed) — a good proxy for BPE
    token budgets without a merges table.  Pure JVM codegen."""
    return docs.withColumn(
        out_col,
        F.size(F.expr(
            f'regexp_extract_all({text_col}, "{BPE_PATTERN}", 0)'
        )),
    )


def boilerplate_coverage(docs: DataFrame, n: int = 8, min_docs: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """CCNet/RefinedWeb-style cross-document boilerplate detection
    (engine addition — no reference counterpart; a standard
    training-corpus cleaning pass): an ``n``-token window is
    *boilerplate* when its exact text occurs in >= ``min_docs``
    distinct documents (headers, footers, license blocks, mirrored
    spans).  Output per document: total tokens, tokens covered by at
    least one boilerplate window (union of overlapping window
    intervals), and the clean remainder.

    Scale shape (100 TB): everything stays JVM-side.  One pass builds
    (doc, pos, md5-of-window) rows inside whole-stage codegen (no
    Python); the global gram frequency is ONE hash aggregation with
    map-side partial aggregation (count(DISTINCT doc) per gram is
    rewritten by Spark into two-level partial aggs); the join back is a
    hash equi-join on the gram digest — uniformly distributed keys by
    construction (md5), and the frequent-gram probe skew is exactly
    what AQE skew-join splitting handles.  Coverage is a per-doc
    count(DISTINCT position): positions <= doc length, so the final
    aggregation state is bounded by document size, never corpus size.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = (
        docs.select(id_col, toks.alias("_toks"))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
    )
    wins = base.filter(F.col("n_tokens") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), (F.col("n_tokens") - n + 1).cast("int")),
                lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i, n))),
            )
        ).alias("pos0", "gram"),
    )
    bp = (
        wins.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    covered = (
        wins.join(bp, "gram")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos0"), F.col("pos0") + n - 1)
            ).alias("p"),
        )
        .groupBy(id_col)
        .agg(F.countDistinct("p").alias("covered_tokens"))
    )
    return (
        base.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0).cast("long")).alias(
                "covered_tokens"
            ),
            (F.col("n_tokens")
             - F.coalesce("covered_tokens", F.lit(0).cast("long"))
             ).alias("clean_tokens"),
        )
    )


def chunk_documents(docs: DataFrame, window: int = 64,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sequence packing / sharding prep (engine addition): split every
    document's token stream into fixed ``window``-token training
    chunks.  Emits one row per chunk with its length, first/last token
    and the pad waste of the tail chunk — the exact bookkeeping a
    context-window packer needs before writing training shards.

    Scale shape: zero shuffle — pure per-row array math (sequence +
    posexplode) in whole-stage codegen; output partitioning inherits
    the scan, so a downstream shard writer can repartition once by
    (doc_id, chunk_idx) range.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = (
        docs.select(id_col, toks.alias("_toks"))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .filter(F.col("n_tokens") > 0)
    )
    n_chunks = ((F.col("n_tokens") + window - 1) / window).cast("long")
    exploded = base.select(
        id_col,
        "_toks",
        "n_tokens",
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("_i", "chunk_idx"),
    )
    start = F.col("chunk_idx") * window  # 0-based token offset
    chunk_len = F.least(F.lit(window).cast("long"), F.col("n_tokens") - start)
    return exploded.select(
        id_col,
        "chunk_idx",
        "n_tokens",
        chunk_len.alias("chunk_len"),
        (F.lit(window) - chunk_len).alias("pad_tokens"),
        F.element_at("_toks", (start + 1).cast("int")).alias("first_token"),
        F.element_at("_toks", (start + chunk_len).cast("int")).alias(
            "last_token"
        ),
    )


def pack_sequences(docs: DataFrame, capacity: int = 256,
                   n_buckets: int = 64, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing (the layout LLM pretraining
    actually trains on): every document's token stream is concatenated
    in ``id_col`` order into ONE global stream, which is cut into
    fixed-``capacity`` bins; documents spill across bin boundaries, so
    there is zero pad waste except in the final bin.

    The crux is a global prefix sum over token counts — a naive
    ``sum() over (order by id)`` window moves the whole table through a
    SINGLE partition.  Distributed shape instead:

    1. deterministic range buckets from the id value (no sampling, no
       sort): bucket = floor(id * n_buckets / (max_id + 1)); the one
       max(id) scalar lookup is a documented driver-side scalar agg;
    2. within-bucket running sum — n_buckets parallel window
       partitions;
    3. per-bucket totals (n_buckets rows) get their exclusive running
       offset in a single TINY window, broadcast-joined back.

    start/end are exact int64 global token offsets; each doc explodes
    to its <= (len/capacity + 1) overlapped bins in codegen.

    Output: (bin_id, id_col, start_in_bin, len_in_bin, n_tokens) — one
    row per (bin, doc) slice; sum(len_in_bin) per bin == capacity for
    all bins but the last.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    lens = (
        docs.select(F.col(id_col), F.size(toks).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    # documented driver-side SCALAR agg (same pattern as spatial_join's
    # small-side probes): one number, not data
    max_id = lens.agg(F.max(id_col)).collect()[0][0]
    if max_id is None:
        return lens.select(
            F.lit(0).cast("long").alias("bin_id"),
            F.col(id_col),
            F.lit(0).cast("long").alias("start_in_bin"),
            F.lit(0).cast("long").alias("len_in_bin"),
            "n_tokens",
        ).limit(0)
    b = (F.col(id_col) * n_buckets / (int(max_id) + 1)).cast("long")
    lens = lens.withColumn("_b", b)
    w_in = Window.partitionBy("_b").orderBy(id_col)
    lens = lens.withColumn("_end_in_b", F.sum("n_tokens").over(w_in))
    # bucket total == max running end: reuses the window's exchange
    # output (same partitioning) instead of re-scanning the input
    btot = lens.groupBy("_b").agg(F.max("_end_in_b").alias("_tot"))
    w_b = Window.orderBy("_b")  # n_buckets rows: tiny single partition
    boff = btot.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_b) - F.col("_tot"),
                           F.lit(0)).cast("long")
    ).select("_b", "_off")
    d = lens.join(F.broadcast(boff), "_b")
    start = (F.col("_off") + F.col("_end_in_b") - F.col("n_tokens"))
    end = F.col("_off") + F.col("_end_in_b")
    d = d.withColumn("_start", start).withColumn("_end", end)
    bin_id = F.explode(
        F.sequence(
            F.floor(F.col("_start") / capacity),
            F.floor((F.col("_end") - 1) / capacity),
        )
    ).alias("bin_id")
    d = d.select(F.col(id_col), "n_tokens", "_start", "_end", bin_id)
    lo = F.greatest(F.col("_start"), F.col("bin_id") * capacity)
    hi = F.least(F.col("_end"), (F.col("bin_id") + 1) * capacity)
    return d.select(
        "bin_id",
        F.col(id_col),
        (lo - F.col("bin_id") * capacity).cast("long").alias("start_in_bin"),
        (hi - lo).cast("long").alias("len_in_bin"),
        "n_tokens",
    )


def quality_histogram(docs: DataFrame, buckets: int = 10) -> DataFrame:
    """Quality-score distribution per source: bucket =
    floor(quality * buckets) clamped to [0, buckets] — the curation
    dashboard histogram.  The quality doubles are identical expression
    trees in any IEEE engine, so even the bucket-edge rows land
    identically; one scan, one shuffle.

    Output: (source, bucket:int, n_docs).
    """
    q = with_quality_score(docs)
    b = F.least(
        F.greatest(F.floor(F.col("quality_score") * buckets), F.lit(0)),
        F.lit(buckets),
    ).cast("int")
    return (
        q.groupBy("source", b.alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (fastText-style hashing trick)
# ---------------------------------------------------------------------------

_CLS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("logit", LongType()),
    ]
)

_CLS_PRIME = 1099511628211  # FNV prime reused as the weight mixer
_CLS_RANGE = 2001           # weights in [-1000, 1000]


def _bucket_weight(buckets: np.ndarray) -> np.ndarray:
    """Deterministic integer weight for a feature bucket:
    ((bucket * FNV_PRIME) mod 2^64) % 2001 - 1000.  Stands in for
    trained coefficients exactly like the multimodal fake codecs stand
    in for image decoders: the distributed plumbing (hashing trick,
    row-local scoring, exact integer logits) is the contract; a real
    model loads its table through the ``weights`` argument."""
    with np.errstate(over="ignore"):
        mixed = buckets.astype(np.uint64) * np.uint64(_CLS_PRIME)
    return (mixed % np.uint64(_CLS_RANGE)).astype(np.int64) - 1000


def classifier_scores(docs: DataFrame, text_col: str = "text",
                      n_buckets: int = 1 << 20,
                      weights: DataFrame | None = None) -> DataFrame:
    """fastText-style linear classifier over hashed unigram features
    (the hashing trick: feature id = FNV-1a(token) mod ``n_buckets``).

    Score = sum of per-token bucket weights — exact int64 (|w| <= 1000,
    so overflow needs 9e15 tokens/doc).  Returns every input doc:
    (doc_id, n_tokens, logit, label) with label = 1 iff logit > 0.

    Scale shape (100 TB): with derived weights this is ZERO-shuffle —
    tokenize (JVM), one Arrow pass hashing the batch's unique words
    (vocabulary-sized work, not token-sized), row-local reduction;
    no join, no agg exchange.  With a ``weights`` table (bucket:long,
    weight:long — a trained model), buckets join against the broadcast
    table and re-aggregate per doc: one shuffle, weights never exceed
    ``n_buckets`` rows by construction so the broadcast is bounded.
    """
    from .dedup import _hash_words_batch

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), toks.alias("_toks")
    )

    if weights is not None:
        from pyspark.sql import functions as _F

        def hash_part(batches):
            for b in batches:
                ws = [list(t) for t in b["_toks"]]
                hs = _hash_words_batch(ws)
                lens = np.fromiter((len(h) for h in hs), np.int64,
                                   count=len(hs))
                flat = (np.concatenate(hs) if len(hs) else
                        np.empty(0, np.uint64))
                yield pd.DataFrame({
                    "doc_id": np.repeat(b["doc_id"].to_numpy(np.int64),
                                        lens),
                    "bucket": (flat % np.uint64(n_buckets)).view(np.int64),
                })

        tok_buckets = base.mapInPandas(
            hash_part,
            StructType([StructField("doc_id", LongType()),
                        StructField("bucket", LongType())]),
        )
        joined = tok_buckets.join(_F.broadcast(weights), "bucket", "left")
        scored = joined.groupBy("doc_id").agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("logit"),
        )
    else:

        def score(batches):
            for b in batches:
                ws = [list(t) for t in b["_toks"]]
                hs = _hash_words_batch(ws)
                lens = np.fromiter((len(h) for h in hs), np.int64,
                                   count=len(hs))
                n = len(ws)
                if lens.sum() == 0:
                    logit = np.zeros(n, dtype=np.int64)
                else:
                    flat = np.concatenate([h for h in hs if len(h)])
                    w = _bucket_weight(flat % np.uint64(n_buckets))
                    seg = np.repeat(np.arange(n), lens)
                    # |w|<=1000 and docs are small: float64 bincount sums
                    # are exact integers far below 2^53
                    logit = np.bincount(
                        seg, weights=w.astype(np.float64), minlength=n
                    ).astype(np.int64)
                yield pd.DataFrame({
                    "doc_id": b["doc_id"].to_numpy(np.int64),
                    "n_tokens": lens,
                    "logit": logit,
                })

        # one row per input doc straight out of the Arrow pass — no
        # join-back, the whole query plan is scan -> mapInPandas
        scored = base.mapInPandas(score, _CLS_SCHEMA)
        return scored.select(
            "doc_id", "n_tokens", "logit",
            F.when(F.col("logit") > 0, 1).otherwise(0).cast("int")
            .alias("label"),
        )

    # weights path: groupBy drops token-less docs — join them back
    left = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    out = left.join(scored, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("logit", F.lit(0)).alias("logit"),
        F.when(F.coalesce("logit", F.lit(0)) > 0, 1).otherwise(0)
        .cast("int").alias("label"),
    )


def classifier_gate(docs: DataFrame, keep_rate: float = 0.6,
                    text_col: str = "text",
                    n_buckets: int = 1 << 20,
                    materialize: bool = False) -> DataFrame:
    """Quality-gate calibration: keep the top ``keep_rate`` fraction of
    docs by classifier logit, with the threshold computed EXACTLY as
    the k-th largest logit (k = ceil(keep_rate * n)); ties at the
    threshold are all kept (deterministic, may keep slightly more
    than k).

    Returns (doc_id, n_tokens, logit, thr) for every kept doc.

    Scale shape (100 TB): one classifier pass (zero-shuffle) -> logit
    histogram (ONE hash agg on distinct logit values) -> cumulative
    window over the HISTOGRAM, never raw rows (the group_quantiles
    pattern: window input is |distinct logits|, bounded by corpus
    cardinality but typically far below it) -> 1-row threshold
    broadcast back over the scores.  No full-corpus sort anywhere.
    """
    scores = classifier_scores(docs, text_col=text_col,
                               n_buckets=n_buckets)
    if materialize:
        # The scores subtree feeds BOTH the histogram and the output
        # side; it is a zero-shuffle scan+Arrow pass, so the default
        # recompute costs one extra scan (the ngram materialize_grams
        # precedent).  Opt in when the tokenize/scan dominates.
        scores = scores.localCheckpoint(eager=False)
    hist = scores.groupBy("logit").agg(F.count("*").alias("_c"))
    w_cum = Window.orderBy(F.col("logit").desc()) \
                  .rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    h = hist.select(
        "logit",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    k = F.ceil(F.lit(float(keep_rate)) * F.col("_n")).cast("long")
    thr = h.filter(F.col("_cum") >= k).agg(
        F.max("logit").alias("thr")
    )
    return (
        scores.join(F.broadcast(thr))
        .filter(F.col("logit") >= F.col("thr"))
        .select("doc_id", "n_tokens", "logit", "thr")
    )
