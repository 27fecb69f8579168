"""Training-corpus materialization: the end-to-end filter chain a
large-scale LLM data pipeline runs over a raw document table —

1. quality gate (length / stopword / punctuation heuristics),
2. language gate,
3. exact-duplicate keeper (smallest doc_id per identical text),
4. near-duplicate cluster keeper (smallest doc_id per minhash-LSH
   connected component — operators/dedup.duplicate_clusters).

Everything except the minhash signatures is JVM codegen; the whole
chain is oracled in SQL (oracle.corpus_filter_sql) by composing the
individually-proven sub-oracles.

Scale shape: gates are per-row codegen (no shuffle); the exact-keeper
is one md5 groupBy (map-side combine) joined back; the near-dup keeper
reuses the bucketed LSH + O(log n)-round component pipeline.  At
10^12 docs nothing here is new load beyond the dedup passes themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import duplicate_clusters
from .text import with_lang_id, with_quality_score


def build_training_corpus(docs: DataFrame, quality_min: float = 0.5,
                          langs: tuple[str, ...] = ("en",),
                          near_dup_threshold: float = 0.5,
                          n_bands: int = 32,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Documents that survive all four gates, with their token budget
    and quality metadata: (doc_id, n_tokens, quality_score, lang_pred).

    Keeper semantics are deterministic and oracle-checkable: a cluster
    survives only through its smallest doc_id, and that representative
    must itself pass the quality/language gates (if the representative
    fails, the cluster is dropped — the conservative choice: a cluster
    whose canonical copy is junk is junk).
    """
    scored = with_lang_id(with_quality_score(docs))

    exact_keepers = (
        docs.select(F.md5(F.col(text_col)).alias("_md5"),
                    F.col(id_col).alias("_id"))
        .groupBy("_md5")
        .agg(F.min("_id").alias("_keep"))
    )
    cluster_keepers = (
        duplicate_clusters(
            docs, threshold=near_dup_threshold, id_col=id_col,
            text_col=text_col, n_bands=n_bands,
        )
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    )

    return (
        scored.withColumn("_md5", F.md5(F.col(text_col)))
        .join(exact_keepers, "_md5")
        .filter(F.col(id_col) == F.col("_keep"))
        .join(
            cluster_keepers.withColumnRenamed("doc_id", id_col), id_col
        )
        .filter(F.col("quality_score") >= quality_min)
        .filter(F.col("lang_pred").isin(*langs))
        .select(
            F.col(id_col).alias("doc_id"),
            "n_tokens", "quality_score", "lang_pred",
        )
    )


def gate_funnel(docs: DataFrame, min_chars: int = 100,
                min_tokens: int = 20, min_quality: float = 0.6,
                max_punct: float = 0.1) -> DataFrame:
    """Filter-funnel observability: how many documents survive each
    successive quality gate (chars -> tokens -> quality -> punct) —
    the per-stage report a corpus-curation job logs.  All gates are
    per-row predicates, so the whole funnel is ONE scan with
    conditional-sum aggregates (never one pass per gate).

    Output: (gate:int, gate_name, n_surviving) with gate 0 = input.
    """
    from .text import with_quality_score

    q = with_quality_score(docs)
    g1 = F.col("n_chars_calc") >= min_chars
    g2 = F.col("n_tokens") >= min_tokens
    g3 = F.col("quality_score") >= min_quality
    g4 = F.col("punct_ratio") <= max_punct
    chain = [
        ("input", F.lit(True)),
        ("min_chars", g1),
        ("min_tokens", g1 & g2),
        ("min_quality", g1 & g2 & g3),
        ("max_punct", g1 & g2 & g3 & g4),
    ]
    row = q.agg(*[
        F.sum(c.cast("long")).alias(f"_g{i}")
        for i, (_, c) in enumerate(chain)
    ])
    packed = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("gate"),
            F.lit(name).alias("gate_name"),
            F.col(f"_g{i}").alias("n_surviving"),
        )
        for i, (name, _) in enumerate(chain)
    ])
    return row.select(F.explode(packed).alias("p")).select("p.*")


def snapshot_diff(old_docs: DataFrame, new_docs: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Corpus snapshot diff — the change-data view between two corpus
    generations a recurring ingestion keeps: per doc id,

    - ``added``: present only in the new snapshot,
    - ``removed``: present only in the old snapshot,
    - ``changed``: present in both with different text (md5 compare),
    - ``unchanged``: present in both, identical text.

    Output: (doc_id, status, old_md5, new_md5) — the md5s make the row
    self-verifying and let downstream stages re-process exactly the
    added+changed set (the incremental_dedup batch) without ever
    diffing text bytes again.

    Scale shape: texts reduce to md5 at the scan (projection carries 32
    bytes/side, never the document body); ONE full-outer hash equi-join
    on the id; no windows, no skew surface (ids are unique per side).
    """
    o = old_docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(text_col).alias("old_md5"),
        F.lit(True).alias("_in_old"),
    )
    n = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(text_col).alias("new_md5"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "doc_id", "full_outer")
    # presence flags, not md5 nullness: md5(NULL text) is NULL, so a
    # doc with NULL text present in both snapshots must still compare
    # as unchanged (null-safe equality), never as added/removed
    return j.select(
        "doc_id",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_md5").eqNullSafe(F.col("new_md5")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_md5",
        "new_md5",
    )
