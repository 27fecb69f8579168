"""LSH hot-bucket cap soak on a WEB-CRAWL-SHAPED corpus (r4 verdict
next-round #9): power-law (zipf-like) duplicate-cluster sizes plus
shared per-site boilerplate, instead of the single synthetic flood of
tools/lsh_cap_soak.py.

Corpus model (fully distributed synthesis — no driver-side rows):

  - doc i draws u = hash-uniform(i) and joins duplicate cluster
    c = floor(u^POW * N_CLUSTERS): cluster sizes follow a power law
    with exponent -(1 - 1/POW), giving a handful of huge
    boilerplate-flood clusters, a tail of small genuine-dup clusters,
    and mostly singletons — the measured shape of crawl dedup
    (Lee et al., RefinedWeb).
  - members of a cluster share a 120-word base text with m in {1, 2}
    word mutations per member (pairwise <= 4 changed words of ~140 ->
    <= 12 changed trigram shingles, shingle-Jaccard >= ~0.84, above
    the 0.8 threshold) -> every intra-cluster pair is a GENUINE
    near-dup.
  - every doc prepends its site's 20-word boilerplate header
    (site = cluster % N_SITES), so unrelated docs share band buckets
    the way templated pages do.

Legs:

  A (default 200k docs, POW=3, head cluster ~2.7k): capped vs uncapped
    side-by-side with FULL exact-Jaccard verification — direct
    verified per-doc recall delta, stratified by cluster size.
  B (default 5M docs, POW=8, head cluster ~10^5-10^6): the shape where
    uncapped is not runnable AT ALL (the histogram's implied candidate
    count is reported — O(10^10-10^11) pairs from the head buckets
    alone).  The capped run measures CANDIDATE-level per-doc recall
    (candidacy is the only stage the cap affects; verification is
    cap-independent) stratified by cluster size, plus exact-Jaccard
    precision on a 1% candidate sample.

Per-doc recall = fraction of docs in clusters of size >= 2 that pair
with >= 1 cluster sibling — the keep-one semantics dedup needs.  The
stratification (2-50 / 51-1000 / >1000) shows the cap's documented
loss is CONFINED to the pathological flood clusters while small-
cluster recall is unchanged.

Run:  python tools/lsh_cap_skew_soak.py A [n_docs] [cap]
      python tools/lsh_cap_skew_soak.py B [n_docs] [cap]
Prints one JSON line per leg; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from s2_geometry_rust_spark.operators.dedup import (  # noqa: E402
    _band_signatures,
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)
from s2_geometry_rust_spark.session import get_spark  # noqa: E402

WORDS = np.array([f"w{i}" for i in range(20000)])
BASE_LEN = 120
BOILER_LEN = 20
N_SITES = 97
STRATA = [(2, 50), (51, 1000), (1001, 1 << 60)]


def synth_crawl(spark, n_docs: int, n_clusters: int, pow_: float,
                partitions: int = 64) -> DataFrame:
    """(doc_id, cluster_id, text) — deterministic, synthesized inside
    the scan partition (mapInPandas over spark.range)."""

    def gen(batches):
        for b in batches:
            ids = b["id"].to_numpy(np.int64)
            # uniform in [0,1) from a splitmix-style integer hash
            h = ids.astype(np.uint64)
            h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            h = (h ^ (h >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
            u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            clu = np.minimum(
                (u ** pow_ * n_clusters).astype(np.int64), n_clusters - 1
            )
            texts = []
            for i, c in zip(ids, clu):
                rs = np.random.default_rng(int(c) * 1_000_003 + 7)
                base = WORDS[rs.integers(0, len(WORDS), BASE_LEN)].copy()
                rm = np.random.default_rng(int(i) * 31 + 11)
                n_mut = 1 if (i % 2 == 0) else 2
                pos = rm.choice(BASE_LEN, size=n_mut, replace=False)
                base[pos] = WORDS[rm.integers(0, len(WORDS), n_mut)]
                site = np.random.default_rng(int(c) % N_SITES + 500_000)
                boiler = WORDS[site.integers(0, 400, BOILER_LEN)]
                texts.append(" ".join(np.concatenate([boiler, base])))
            yield pd.DataFrame(
                {"doc_id": ids, "cluster_id": clu, "text": texts}
            )

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(
        gen, "doc_id long, cluster_id long, text string"
    )


def bucket_histogram(banded: DataFrame) -> dict:
    """log2 bucket-size histogram + top sizes from a banded frame."""
    sizes = banded.groupBy("band", "bucket").agg(
        F.count("*").alias("s")
    ).persist()
    hist = {
        int(r["b"]): int(r["n"])
        for r in sizes.groupBy(
            F.floor(F.log2("s")).alias("b")
        ).agg(F.count("*").alias("n")).collect()
    }
    top = [int(r["s"]) for r in
           sizes.orderBy(F.desc("s")).limit(5).collect()]
    implied = sizes.agg(
        F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    sizes.unpersist()
    return {"log2_size_hist": hist, "top_bucket_sizes": top,
            "implied_candidate_pairs": int(implied)}


def per_doc_recall(pairs: DataFrame, docs: DataFrame) -> dict:
    """Keep-one recall of intra-cluster pairing, stratified by cluster
    size: fraction of docs in clusters of size >= 2 that appear in
    >= 1 pair with a cluster sibling."""
    clu = docs.select("doc_id", "cluster_id")
    sized = clu.groupBy("cluster_id").agg(F.count("*").alias("cs"))
    dup_docs = clu.join(sized, "cluster_id").filter(
        F.col("cs") >= 2).persist()
    v = (
        pairs
        .join(clu.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("cluster_id", "ca"), "doc_a")
        .join(clu.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("cluster_id", "cb"), "doc_b")
        .filter(F.col("ca") == F.col("cb"))
    )
    flagged = (
        v.select(F.col("doc_a").alias("doc_id"))
        .union(v.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    hit = dup_docs.join(flagged, "doc_id", "left_semi").persist()
    out: dict = {}
    n_dup, n_hit = dup_docs.count(), hit.count()
    out["all"] = {"dup_docs": n_dup, "flagged": n_hit,
                  "recall": round(n_hit / max(n_dup, 1), 4)}
    for lo, hi in STRATA:
        d = dup_docs.filter(F.col("cs").between(lo, hi)).count()
        f = hit.filter(F.col("cs").between(lo, hi)).count()
        out[f"size_{lo}_{'inf' if hi > 10**9 else hi}"] = {
            "dup_docs": d, "flagged": f,
            "recall": round(f / max(d, 1), 4)}
    dup_docs.unpersist()
    hit.unpersist()
    return out


def run_leg(leg: str, n_docs: int, cap: int) -> None:
    spark = get_spark(f"lsh-skew-{leg}", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("OFF")
    pow_ = 3.0 if leg == "A" else 8.0
    n_clusters = max(n_docs, 10) * 2
    parts = int(os.environ.get("SPARK_GRAFT_PARTITIONS", "64"))
    docs = synth_crawl(spark, n_docs, n_clusters, pow_, parts).persist()
    head = docs.groupBy("cluster_id").count().orderBy(
        F.desc("count")).limit(3).collect()
    out: dict = {
        "leg": leg, "n_docs": n_docs, "cap": cap, "pow": pow_,
        "head_cluster_sizes": [int(r["count"]) for r in head],
    }
    t0 = time.time()
    sigs = minhash_signatures(docs).persist()
    sigs.count()
    out["sec_signatures"] = round(time.time() - t0, 1)

    out["bucket_hist_uncapped"] = bucket_histogram(
        _band_signatures(sigs, 32, 128, None))
    out["bucket_hist_capped"] = bucket_histogram(
        _band_signatures(sigs, 32, 128, cap))

    if leg == "A":
        for label, mpb in (("uncapped", None), ("capped", cap)):
            t0 = time.time()
            cands = lsh_candidate_pairs(sigs, n_bands=32,
                                        max_per_bucket=mpb)
            ver = verify_jaccard(cands, docs, 0.8).persist()
            n_ver = ver.count()
            rec = per_doc_recall(ver.select("doc_a", "doc_b"), docs)
            out[label] = {"verified_pairs": n_ver,
                          "sec": round(time.time() - t0, 1),
                          "recall": rec}
            ver.unpersist()
    else:
        t0 = time.time()
        cands = lsh_candidate_pairs(sigs, n_bands=32,
                                    max_per_bucket=cap).persist()
        n_c = cands.count()
        rec = per_doc_recall(cands, docs)
        out["capped_candidates"] = {
            "candidate_pairs": n_c,
            "sec": round(time.time() - t0, 1),
            "candidate_recall": rec,
        }
        # precision on a 1% deterministic candidate sample: exact
        # Jaccard >= threshold rate among sampled candidate pairs
        t0 = time.time()
        samp = cands.filter(
            F.xxhash64("doc_a", "doc_b") % 100 == 0)
        n_s = samp.count()
        n_ok = verify_jaccard(samp, docs, 0.8).count()
        out["sampled_precision"] = {
            "sampled": n_s, "verified": n_ok,
            "precision": round(n_ok / max(n_s, 1), 4),
            "sec": round(time.time() - t0, 1),
        }
        cands.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    leg = sys.argv[1] if len(sys.argv) > 1 else "A"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else (
        200_000 if leg == "A" else 5_000_000)
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    run_leg(leg, n_docs, cap)
