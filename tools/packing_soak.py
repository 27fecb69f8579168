"""Sequence-packing soak: the bucketed distributed prefix sum at
millions of documents, verified EXACTLY without materializing the
ground-truth packing.

Construction: doc i has (i % 97) + 1 tokens, so every global offset is
a closed-form arithmetic-series sum — the invariants below catch any
prefix-sum error (bucket offset off-by-one, boundary double-count):

1. global conservation: sum(len_in_bin) == sum of all token counts;
2. per-doc conservation: each doc's slices sum to its token count;
3. bin-fill: every bin except the last holds exactly `capacity`;
4. spot-exactness: for 1,000 sampled docs, the reconstructed global
   start offset (bin_id * capacity + start_in_bin of the doc's first
   slice) equals the closed-form prefix sum of (j % 97) + 1 for j < i.

Token counts are synthesized as literal text ("t t t ...") so the soak
exercises the real tokenizer path, not a shortcut length column.

Usage: python tools/packing_soak.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _closed_form_start(i: int) -> int:
    """sum_{j<i} ((j % 97) + 1) in O(1)."""
    full, rem = divmod(i, 97)
    return full * (97 * 98 // 2) + rem * (rem + 1) // 2 + i - full * 97 - rem


def main(n: int = 2_000_000, cpus: int = 16, capacity: int = 2048) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.text import pack_sequences
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("packing-soak", cpus=cpus)
    docs = (
        spark.range(n, numPartitions=cpus * 4)
        .select(
            F.col("id").alias("doc_id"),
            F.array_repeat(F.lit("t"), ((F.col("id") % 97) + 1).cast("int"))
            .alias("_a"),
        )
        .select("doc_id", F.array_join("_a", " ").alias("text"))
    )
    total_tokens = sum((j % 97) + 1 for j in range(97)) * (n // 97) + sum(
        (j % 97) + 1 for j in range(n % 97)
    )

    t0 = time.time()
    packed = pack_sequences(docs, capacity=capacity, n_buckets=256)
    packed.persist()
    agg = packed.agg(
        F.sum("len_in_bin").alias("tok"),
        F.countDistinct("bin_id").alias("bins"),
        F.max("bin_id").alias("last_bin"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["tok"] == total_tokens, (agg["tok"], total_tokens)
    assert agg["bins"] == agg["last_bin"] + 1  # no gaps

    per_doc_bad = (
        packed.groupBy("doc_id")
        .agg(F.sum("len_in_bin").alias("s"), F.first("n_tokens").alias("n"))
        .filter(F.col("s") != F.col("n"))
        .count()
    )
    assert per_doc_bad == 0

    fills = (
        packed.groupBy("bin_id").agg(F.sum("len_in_bin").alias("fill"))
        .filter((F.col("fill") != capacity)
                & (F.col("bin_id") != agg["last_bin"]))
        .count()
    )
    assert fills == 0

    sample_ids = list(range(0, n, max(1, n // 1000)))
    firsts = (
        packed.filter(F.col("doc_id").isin(sample_ids))
        .groupBy("doc_id")
        .agg(F.min(F.struct("bin_id", "start_in_bin")).alias("f"))
        .collect()
    )
    for r in firsts:
        start = r["f"]["bin_id"] * capacity + r["f"]["start_in_bin"]
        want = _closed_form_start(r["doc_id"])
        assert start == want, (r["doc_id"], start, want)

    packed.unpersist()
    print(f"n={n} capacity={capacity} bins={agg['bins']} "
          f"tokens={total_tokens}")
    print(f"wall={dt:.1f}s  docs/s={n / dt:,.0f}  ALL INVARIANTS EXACT")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )
