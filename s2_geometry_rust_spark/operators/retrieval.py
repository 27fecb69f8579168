"""Lexical retrieval ranking over the corpus (engine addition — no
reference counterpart; the retrieval stage a training-data pipeline
needs for RAG-style curation and near-benchmark mining).

BM25 with a RATIONAL idf: ``idf = (N - df + 0.5) / (df + 0.5)``
instead of the classic ``ln(...)`` — division is exactly rounded IEEE
while ``ln`` is libm-dependent, so every per-term contribution (and
therefore the ranking) replays bit-for-bit in any engine.  The rational
idf is a documented, order-preserving-in-df deviation from Robertson's
log formulation (it is exp-of-nothing: strictly monotone in the same
direction, so ranking quality is comparable; the point here is
deterministic scoring at scale).

Contributions are integer-scaled (``round(score * 1e12)``) before the
per-(query, doc) sum so totals are order-independent exact int64 sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _toks(col: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")


def bm25_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              scale: float = 1e12) -> DataFrame:
    """Top-``k`` corpus docs per query under rational-idf BM25.

    Scale shape (100 TB corpus, small query set):
    - postings = groupBy(doc, term) — ONE corpus shuffle with map-side
      partial agg; doc length is a window over the same rows (second
      exchange on doc_id, histogram-sized);
    - document frequencies per term — aggregate of postings;
    - the query side stays tiny: query terms broadcast INTO the big
      dfreq relation, and the (term, query, df) product broadcasts into
      postings — the corpus is never shuffled again;
    - per-(query, doc) integer score sum, then top-k via row_number
      (WindowGroupLimit pushes the cut below the final sort).

    Corpus-level N and avgdl are one driver-side SCALAR agg (two
    numbers, documented pattern) embedded as literals; avgdl is the
    exactly-rounded quotient of exact integers so any engine derives
    the identical double.

    Output: (query_id, doc_id, score_e12:long, rank:int).
    """
    post = (
        corpus.select("doc_id", F.explode(_toks("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    post = post.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    # driver-side scalar agg: N docs + total token count -> avgdl
    row = (
        corpus.select(F.size(_toks("text")).cast("long").alias("_n"))
        .filter(F.col("_n") > 0)
        .agg(F.count("*").alias("n"), F.sum("_n").alias("s"))
        .collect()[0]
    )
    n_docs, total = int(row["n"]), int(row["s"])
    avgdl = total / n_docs  # exact ints -> correctly-rounded double

    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        "query_id", F.explode(F.array_distinct(_toks("text"))).alias("term")
    )
    qdf = dfreq.join(F.broadcast(qterms), "term")

    idf = (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfw = (F.col("tf") * F.lit(k1 + 1)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * tfw * F.lit(scale), 0).cast("long")

    scores = (
        post.join(F.broadcast(qdf), "term")
        .withColumn("_c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").cast("long").alias("score_e12"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e12").desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_e12", "rank")
    )
