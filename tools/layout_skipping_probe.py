"""Measure what the Hilbert-sorted layout actually buys at scan time:
write the same cell-keyed table (a) Hilbert-range-partitioned + sorted
(write_hilbert_sorted) and (b) randomly shuffled, then run the same
narrow cell-range scan (read_cell_range) on both and compare

  - scan-node output rows (rows surviving parquet row-group pruning +
    pushed-filter evaluation inside the reader), and
  - wall time per scan,

plus result equality.  On the sorted layout a range predicate touches
O(range) row groups because each file/row-group covers a disjoint key
range; on the shuffled layout every row group straddles the whole key
space, so min/max stats prune nothing and the reader materializes the
full table.

Usage: python tools/layout_skipping_probe.py [n_rows] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s2_geometry_rust_spark.functions.udfs import (  # noqa: E402
    cell_id_from_latlng_deg,
)
from s2_geometry_rust_spark.sources.sinks import (  # noqa: E402
    read_cell_range,
    write_hilbert_sorted,
)
from s2_geometry_rust_spark.session import get_spark  # noqa: E402


def scan_output_rows(df) -> int:
    """numOutputRows of the leaf FileScan(s) in the EXECUTED plan (call
    on the acted-on frame): rows the parquet reader actually produced
    after row-group pruning and pushed-filter evaluation.  AQE wraps
    stages in QueryStageExec leaves, so recurse through .plan()."""
    def deep_leaves(node, out):
        if "QueryStageExec" in node.getClass().getName():
            deep_leaves(node.plan(), out)
            return
        ls = node.collectLeaves()
        for i in range(ls.size()):
            leaf = ls.apply(i)
            if "QueryStageExec" in leaf.getClass().getName():
                deep_leaves(leaf.plan(), out)
            else:
                out.append(leaf)

    ep = df._jdf.queryExecution().executedPlan()
    root = (ep.executedPlan()
            if "Adaptive" in ep.getClass().getName() else ep)
    leaves: list = []
    deep_leaves(root, leaves)
    total = 0
    for leaf in leaves:
        m = leaf.metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


def main(n: int = 4_000_000, cpus: int = 16) -> int:
    spark = get_spark("layout-probe", cpus=cpus)
    base = tempfile.mkdtemp(prefix="layoutprobe_")
    sorted_path = os.path.join(base, "hilbert_sorted")
    shuffled_path = os.path.join(base, "shuffled")

    def u(tag):
        return (F.pmod(F.xxhash64(F.col("id"), F.lit(tag)),
                       F.lit(1_000_000)) / 1e6)

    rows = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (-80.0 + 160.0 * u("lat")).alias("lat"),
            (-180.0 + 360.0 * u("lng")).alias("lng"),
        )
        .withColumn("cell_id", cell_id_from_latlng_deg("lat", "lng"))
    )
    write_hilbert_sorted(rows, sorted_path, num_partitions=64)
    # shuffled twin: random order, same row count/content
    rows.orderBy(F.xxhash64("doc_id", F.lit("shuf"))).write.mode(
        "overwrite").parquet(shuffled_path)

    # a 1/96th-of-the-sphere Hilbert range (one level-2 cell), mid-curve
    from s2_geometry_rust_spark.kernels import cellid as ck
    import numpy as np
    probe_cell = ck.from_face_pos_level(2, 0, 2)  # a face-2 level-2 cell
    lo = int(np.uint64(ck.range_min(np.array([probe_cell], np.uint64))[0]))
    hi = int(np.uint64(ck.range_max(np.array([probe_cell], np.uint64))[0]))

    out = {"n_rows": n, "range": [lo, hi]}
    for label, path in (("hilbert_sorted", sorted_path),
                        ("shuffled", shuffled_path)):
        t0 = time.time()
        df = read_cell_range(spark, path, lo, hi)
        got = df.count()
        dt = time.time() - t0
        # rerun with an aggregating action to read executed-plan metrics
        cnt = read_cell_range(spark, path, lo, hi).select(F.count("*"))
        cnt.collect()
        scanned = scan_output_rows(cnt)
        out[label] = {"matching_rows": got,
                      "scan_output_rows": scanned,
                      "sec": round(dt, 2)}
    s, h = out["shuffled"], out["hilbert_sorted"]
    out["scan_rows_ratio"] = round(
        s["scan_output_rows"] / max(h["scan_output_rows"], 1), 1)
    out["results_equal"] = s["matching_rows"] == h["matching_rows"]
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0 if out["results_equal"] else 1


if __name__ == "__main__":
    raise SystemExit(main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    ))
