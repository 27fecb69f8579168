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

    BASELINE OPERATOR — the *query* side is collected to the driver and
    broadcast as one numpy matrix, so it must stay driver-sized
    (~<= 10^5 queries / ~2.4 MB per 10^5 at 3 doubles + id; the
    candidate side streams once and is unbounded).  For query sets past
    that bound use ``knn_cell_ring``, the fully-distributed scale twin
    (same output contract, oracled separately).
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
                  start_level: int = 8, margin_levels: int = 1,
                  query_id: str = "query_id", cand_id: str = "cand_id",
                  query_cell: str = "cell_id", cand_cell: str = "cell_id",
                  query_xyz=("x", "y", "z"), cand_xyz=("x", "y", "z")
                  ) -> DataFrame:
    """Cell-ring expansion kNN (north-star semantics): candidates from
    the query's cell at level L, widening L <- L-1 until >= k
    candidates, then exact squared-chord distance + top-k.

    Physical plan — 3 jobs total, independent of how many levels the
    widening logically visits (the naive per-level driver loop runs
    2 jobs *per level*):

    1. density pass: one groupBy over candidates counting per-cell
       candidates at every level in [0, start_level] simultaneously
       (explode over the ancestor chain — pure bit expressions);
    2. per-query level choice: join queries to the (broadcastable)
       density table and take the deepest level with count >= k —
       exactly the level the iterative widening would stop at;
    3. candidate join at the chosen level: candidates exploded once per
       distinct chosen level (bounded fan-out), hash-joined on
       (level, ancestor), then window top-k.

    Approximate by design (neighbors outside the shared ancestor are
    unseen); recall vs knn_bruteforce is pytest-checked.
    """
    levels = list(range(0, start_level + 1))
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

    # 1. per-(level, cell) candidate density — one pass, map-side combine.
    # Only cells with n >= k can ever be chosen, so the filter keeps the
    # density table tiny (deep levels contribute almost nothing once the
    # per-cell count drops below k); with that bound it is always safe
    # to broadcast into the per-query level-choice join — no shuffle of
    # the query side, no risk of a large build side at deep levels.
    anc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lv).alias("lv"), cell_parent("_ccell", lv).alias("cell")
                )
                for lv in levels
            ]
        )
    ).alias("_a")
    density = (
        c.select(anc)
        .select(F.col("_a.lv").alias("lv"), F.col("_a.cell").alias("cell"))
        .groupBy("lv", "cell")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= k)
    )

    # 2. deepest level with n >= k per query (the widening stop level);
    #    fall back to level 0 when even the face has < k candidates
    qa = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lv).alias("lv"),
                        cell_parent("_qcell", lv).alias("cell"),
                    )
                    for lv in levels
                ]
            )
        ).alias("_a"),
    ).select("query_id", F.col("_a.lv").alias("lv"), F.col("_a.cell").alias("cell"))
    # density rows are bounded by the cell-id space, not the data:
    # sum over levels 0..start_level of 6*4^lv  (~524k at start_level 8)
    # and further cut by the n >= k filter — safe to broadcast for
    # start_level <= 8; deeper hierarchies fall back to a hash join
    # (AQE may still choose broadcast from runtime size).
    d = F.broadcast(density) if start_level <= 8 else density
    chosen = (
        qa.join(d, ["lv", "cell"])
        .groupBy("query_id")
        .agg(F.max("lv").alias("lv"))
    )
    # margin_levels coarsens the chosen cell (4^m times the area) so
    # true neighbors just across the cell boundary are still seen —
    # recall lever at bounded extra cost
    chosen = q.join(chosen, "query_id", "left").withColumn(
        "lv",
        F.greatest(
            F.coalesce(F.col("lv"), F.lit(0)) - F.lit(margin_levels), F.lit(0)
        ),
    )

    # 3. single candidate join at each query's chosen level.
    # chosen is consumed twice (distinct-level probe + final join) —
    # materialize once via localCheckpoint so the density pass and
    # level-choice join run once, not twice (measured: the probe
    # re-executed the whole upstream chain).  localCheckpoint rather
    # than persist(): its blocks are released by the ContextCleaner
    # when the frame goes out of scope, so repeated calls in a
    # long-lived session don't accumulate cacheManager entries that
    # only an explicit unpersist would free.
    chosen = chosen.localCheckpoint(eager=True)
    distinct_lv = [r["lv"] for r in chosen.select("lv").distinct().collect()]
    c_exp = c.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lv).alias("lv"),
                        cell_parent("_ccell", lv).alias("_ca"),
                    )
                    for lv in sorted(distinct_lv)
                ]
            )
        ).alias("_a"),
    ).select(
        "neighbor_id", "_cx", "_cy", "_cz",
        F.col("_a.lv").alias("lv"), F.col("_a._ca").alias("_ca"),
    )
    # ancestor at the per-row level: pick from the precomputed chain
    qk = chosen.select(
        "query_id", "lv", "_qx", "_qy", "_qz",
        F.element_at(
            F.array(*[cell_parent("_qcell", lv) for lv in levels]),
            F.col("lv") + 1,
        ).alias("_qa"),
    )
    joined = qk.join(c_exp, (qk["lv"] == c_exp["lv"]) & (qk["_qa"] == c_exp["_ca"]))
    d2 = (
        (F.col("_qx") - F.col("_cx")) * (F.col("_qx") - F.col("_cx"))
        + (F.col("_qy") - F.col("_cy")) * (F.col("_qy") - F.col("_cy"))
        + (F.col("_qz") - F.col("_cz")) * (F.col("_qz") - F.col("_cz"))
    )
    w = Window.partitionBy("query_id").orderBy("chord2", "neighbor_id")
    return (
        joined.withColumn("chord2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "chord2")
    )
