"""Connected-components soak: alternating-star contraction on a large
synthetic graph mixing the easy case (many small duplicate clusters)
with the adversarial one (a 100k-node chain — naive min-label
propagation would need 100k rounds; alternating star closes it in
O(log n)).

Usage: python tools/cc_soak.py [n_cluster_nodes] [chain_len] [cpus]
Validates labels exactly against a union-find ground truth and prints
one JSON line with wall time and throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_edges(n_cluster_nodes: int, chain_len: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    # duplicate-cluster regime: nodes in groups of ~5, star edges to the
    # group's first member plus some random intra-group extras
    base = np.arange(n_cluster_nodes, dtype=np.int64)
    group = base // 5
    hub = group * 5
    star = np.stack([base, hub], axis=1)
    star = star[star[:, 0] != star[:, 1]]
    extra_a = rng.integers(0, n_cluster_nodes, size=n_cluster_nodes // 2)
    extra = np.stack([extra_a, (extra_a // 5) * 5 + rng.integers(0, 5, size=len(extra_a))], axis=1)
    extra = extra[extra[:, 0] != extra[:, 1]]
    # adversarial chain on a disjoint id range
    c0 = n_cluster_nodes
    chain = np.stack(
        [np.arange(c0, c0 + chain_len - 1), np.arange(c0 + 1, c0 + chain_len)],
        axis=1,
    )
    return np.concatenate([star, extra, chain])


def union_find(edges: np.ndarray) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def main() -> None:
    n_cluster = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.operators.dedup import connected_components

    edges = build_edges(n_cluster, chain_len)
    spark = get_spark("cc-soak", cpus=cpus, shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    edf = spark.createDataFrame(
        pd.DataFrame({"doc_a": edges[:, 0], "doc_b": edges[:, 1]})
    ).repartition(cpus * 2)
    edf.count()  # materialize input before timing

    t0 = time.time()
    # force the distributed alternating-star path — this soak validates
    # the scale algorithm, not the small-graph driver union-find
    cc = connected_components(edf, driver_max_edges=0)
    rows = cc.collect()
    wall = time.time() - t0

    got = {r["node"]: r["component"] for r in rows}
    want = union_find(edges)
    n_bad = sum(1 for n, c in want.items() if got.get(n) != c)
    print(
        json.dumps(
            {
                "n_edges": int(len(edges)),
                "n_nodes": len(want),
                "chain_len": chain_len,
                "cpus": cpus,
                "wall_sec": round(wall, 2),
                "edges_per_sec": round(len(edges) / wall, 1),
                "n_components_got": len(set(got.values())),
                "n_components_want": len(set(want.values())),
                "label_mismatches": n_bad,
            }
        )
    )
    spark.stop()
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
