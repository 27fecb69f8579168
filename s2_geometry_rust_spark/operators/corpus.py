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
