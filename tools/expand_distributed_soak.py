"""Scale soak for the distributed cell-union ops (round 5): one union
of ~N random level-14 cells spread over the whole sphere — far beyond
what a single applyInPandas task should be handed — through
expand_distributed, with subsample-exact verification against the
vectorized kernel on the SAME input (the kernel is bit-equal to the
reference linear scan by property test, so this transitively pins the
distributed path to the reference at scale).

Run: python tools/expand_distributed_soak.py [n_cells] [expand_level]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from s2_geometry_rust_spark.kernels import cellid as ci  # noqa: E402
from s2_geometry_rust_spark.kernels import unions as ku  # noqa: E402
from s2_geometry_rust_spark.operators.unions_ops import (  # noqa: E402
    expand_distributed,
    normalize_distributed,
)
from s2_geometry_rust_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lv = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("expand-dist-soak", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("OFF")

    rng = np.random.default_rng(42)
    v = rng.normal(size=(n_cells, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    raw = ci.parent(ci.from_point(v[:, 0], v[:, 1], v[:, 2]),
                    np.full(n_cells, 14))
    t0 = time.time()
    ids = ku.normalize(raw)          # vectorized kernel (ground truth prep)
    want = ku.expand(ids, lv)        # kernel expand == reference scan
    t_kernel = time.time() - t0

    df = spark.createDataFrame(
        [("u", int(np.uint64(i).astype(np.int64))) for i in ids],
        "union_id string, cell_id long",
    ).repartition(64)
    t0 = time.time()
    got = expand_distributed(df, lv).toPandas()
    t_dist = time.time() - t0
    g = np.sort(got.cell_id.to_numpy(np.int64).view(np.uint64))
    exact = bool(np.array_equal(g, np.sort(want)))

    # normalize alone on the raw (pre-normalize) set, for the fixpoint
    # round count story
    raw_df = spark.createDataFrame(
        [("u", int(np.uint64(i).astype(np.int64))) for i in raw[:200000]],
        "union_id string, cell_id long",
    ).repartition(64)
    t0 = time.time()
    n_norm = normalize_distributed(raw_df).count()
    t_norm = time.time() - t0

    print(json.dumps({
        "n_cells_in": n_cells,
        "n_normalized": int(len(ids)),
        "expand_level": lv,
        "n_expanded": int(len(want)),
        "distributed_rows": int(len(g)),
        "exact_match": exact,
        "sec_kernel": round(t_kernel, 1),
        "sec_distributed": round(t_dist, 1),
        "sec_normalize_distributed_200k_raw": round(t_norm, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
