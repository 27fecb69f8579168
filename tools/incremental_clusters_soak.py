"""incremental_duplicate_clusters soak: the CC(star(G_old) U E_new)
== CC(G_old U E_new) identity checked at scale, on the worst split.

Corpus: dedup_soak's generator — every 20th doc is a near copy of its
PREDECESSOR, so every planted pair is (i-1, i) with consecutive ids.
Splitting by id parity therefore puts EVERY planted pair across the
index/batch boundary: the incremental path can only be right if the
cross join + star edges genuinely reconstruct the components (the
old labels contribute nothing but singletons).  A second split
(id % 40 < 20, blocks of 20) puts every pair INSIDE one side, so the
star-compression leg is what carries the components instead.

PASS = full label-set equality (doc_id, cluster_id, cluster_size)
between the incremental path and duplicate_clusters over the full
corpus, under BOTH splits.

Usage: python tools/incremental_clusters_soak.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)
# executor Python workers unpickle the generator by module reference:
# tools/ must be on their PYTHONPATH too (set before the JVM starts)
os.environ["PYTHONPATH"] = (
    _TOOLS + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from dedup_soak import synth_text_docs  # noqa: E402


def labels(df):
    return {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in df.collect()
    }


def main(n: int = 200_000, cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.dedup import (
        duplicate_clusters,
        incremental_duplicate_clusters,
        minhash_signatures,
    )
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("inc-clusters-soak", cpus=cpus)
    docs = synth_text_docs(spark, n)
    docs.persist().count()
    k = F.col("doc_id")

    t0 = time.time()
    full = duplicate_clusters(docs, threshold=0.8, n_bands=32)
    want = labels(full)
    t_full = time.time() - t0
    n_clustered = sum(1 for t in want if t[2] > 1)

    ok = True
    for name, cond in (
        ("parity (every pair crosses)", k % 2 == 0),
        ("blocks-of-20 (every pair inside a side)", k % 40 < 20),
    ):
        index, batch = docs.filter(cond), docs.filter(~cond)
        sigs = minhash_signatures(index, n_perm=128)
        sigs.persist().count()
        labels_old = duplicate_clusters(
            index, threshold=0.8, n_bands=32
        ).select("doc_id", "cluster_id").persist()
        labels_old.count()
        t0 = time.time()
        inc = incremental_duplicate_clusters(
            batch, index, labels_old, threshold=0.8, n_bands=32,
            index_signatures=sigs,
        )
        got = labels(inc)
        dt = time.time() - t0
        eq = got == want
        ok &= eq
        print(
            f"split={name}: incremental wall={dt:.1f}s "
            f"(full recompute={t_full:.1f}s) labels "
            f"{'EQUAL' if eq else 'DIFFER: ' + str(len(got ^ want))}"
        )
        sigs.unpersist()
        labels_old.unpersist()

    print(
        f"docs={n} cpus={cpus} clustered_docs={n_clustered} "
        f"clusters_checked={len(want)}"
    )
    print("RESULT:", "PASS" if ok else "FAIL")
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
