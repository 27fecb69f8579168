"""kNN over the sphere: brute-force (exact, oracle-checkable) and
cell-ring expansion (the scale path; north-star semantics).

The reference's closest-edge/point query subsystem is stubs only
(tests/test_s2query_system_port.rs:37-147 are #[should_panic]), so kNN
follows the north star: candidates from the query's cell at level L,
widening L <- L-1 until >= k candidates, then exact squared-chord-length
distance (chord_angle.rs:90-95) + top-k.

Distance metric: squared chord length |p-q|^2 — monotone in angle,
computed with exactly-rounded arithmetic only (add/sub/mul), so DuckDB
reproduces it bit-for-bit for the oracle.

Scale design:
- brute force never shuffles the candidate side: queries are broadcast,
  a mapInPandas pass emits per-partition local top-k (numpy
  argpartition), and only n_queries * k * n_partitions rows reach the
  final window — the 100 TB candidate scan stays embarrassing-parallel.
- cell-ring does one hash join per widening level on parent-cell
  equality (pure bit-expression keys), with queries that already have
  >= k candidates retired from the next round driver-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions import cell_parent

_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("chord2", DoubleType()),
    ]
)


def knn_bruteforce(queries: DataFrame, candidates: DataFrame, k: int,
                   query_xyz=("x", "y", "z"), cand_xyz=("x", "y", "z"),
                   query_id: str = "query_id",
                   cand_id: str = "cand_id") -> DataFrame:
    """Exact kNN: per-partition local top-k then a global window.

    Output: (query_id, neighbor_id, rank, chord2), rank 1..k ordered by
    (chord2, neighbor_id).
    """
    spark = queries.sparkSession
    qrows = queries.select(
        F.col(query_id).cast("long"),
        *[F.col(c).cast("double") for c in query_xyz],
    ).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_xyz = np.array([[r[1], r[2], r[3]] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((q_ids, q_xyz))

    cx, cy, cz = cand_xyz

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qxyz = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            c_id = b[cand_id].to_numpy(np.int64)
            px = b[cx].to_numpy(np.float64)
            py = b[cy].to_numpy(np.float64)
            pz = b[cz].to_numpy(np.float64)
            # (n_q, n_c) squared chord distances — sub/mul/add only
            dx = px[None, :] - qxyz[:, 0:1]
            dy = py[None, :] - qxyz[:, 1:2]
            dz = pz[None, :] - qxyz[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz
            kk = min(k, d2.shape[1])
            idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(ids, kk)
            rows_c = c_id[idx.ravel()]
            rows_d = np.take_along_axis(d2, idx, axis=1).ravel()
            yield pd.DataFrame(
                {"query_id": rows_q, "neighbor_id": rows_c, "chord2": rows_d}
            )

    local = candidates.mapInPandas(local_topk, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy("chord2", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "chord2")
    )


def knn_cell_ring(queries: DataFrame, candidates: DataFrame, k: int,
                  start_level: int = 8,
                  query_id: str = "query_id", cand_id: str = "cand_id",
                  query_cell: str = "cell_id", cand_cell: str = "cell_id",
                  query_xyz=("x", "y", "z"), cand_xyz=("x", "y", "z")
                  ) -> DataFrame:
    """Cell-ring expansion kNN (north-star semantics).

    For each level L from start_level down to 0: join remaining queries
    to candidates sharing their level-L ancestor cell; queries that have
    accumulated >= k candidates take their exact top-k and retire.
    Approximate by design (candidates outside the shared ancestor are
    not seen); validated against knn_bruteforce recall in tests.
    """
    q = queries.select(
        F.col(query_id).alias("query_id").cast("long"),
        F.col(query_cell).alias("_qcell"),
        *[F.col(c).alias(f"_q{c2}") for c, c2 in zip(query_xyz, "xyz")],
    )
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id").cast("long"),
        F.col(cand_cell).alias("_ccell"),
        *[F.col(c_).alias(f"_c{c2}") for c_, c2 in zip(cand_xyz, "xyz")],
    )
    results = None
    remaining = q
    for lv in range(start_level, -1, -1):
        if remaining.isEmpty():
            break
        joined = remaining.withColumn("_qa", cell_parent("_qcell", lv)).join(
            c.withColumn("_ca", cell_parent("_ccell", lv)),
            F.col("_qa") == F.col("_ca"),
        )
        d2 = (
            (F.col("_qx") - F.col("_cx")) * (F.col("_qx") - F.col("_cx"))
            + (F.col("_qy") - F.col("_cy")) * (F.col("_qy") - F.col("_cy"))
            + (F.col("_qz") - F.col("_cz")) * (F.col("_qz") - F.col("_cz"))
        )
        joined = joined.withColumn("chord2", d2)
        counts = joined.groupBy("query_id").agg(F.count("*").alias("_n"))
        done_ids = counts.filter(F.col("_n") >= k).select("query_id")
        w = Window.partitionBy("query_id").orderBy("chord2", "neighbor_id")
        done = (
            joined.join(F.broadcast(done_ids), "query_id")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "chord2")
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(
            F.broadcast(done_ids), "query_id", "left_anti"
        )
        if lv == 0:
            # level 0 saw every candidate on the query's face; any query
            # still unresolved has < k candidates on its face — emit all.
            rest = (
                joined.join(F.broadcast(done_ids), "query_id", "left_anti")
                .withColumn("rank", F.row_number().over(w))
                .select("query_id", "neighbor_id", "rank", "chord2")
            )
            results = rest if results is None else results.unionByName(rest)
    return results if results is not None else queries.limit(0).select(
        F.lit(0).alias("query_id"),
        F.lit(0).alias("neighbor_id"),
        F.lit(0).alias("rank"),
        F.lit(0.0).alias("chord2"),
    )
