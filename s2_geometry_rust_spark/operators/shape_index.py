"""The shape index as a DataFrame: the reference's
MutableS2ShapeIndex BTreeMap (mutable_shape_index.rs:63-78) re-expressed
as a cell-id-sorted table — the inverted index IS a table.

Build semantics (reference parity, mutable_shape_index.rs:119-193):
a shape's covering = the **level-15 parents of each edge's v0** (dedup;
no edge clipping — the TODOs at :154,157 are part of the pinned
behavior), and every covering cell lists ALL the shape's edges.

Scale shape: build is one narrow pass (leaf-encode v0, parent-15,
distinct) + one equi-join back to edges, then a range write sorted by
unsigned cell key — at cluster scale the sorted parquet/Iceberg layout
gives min/max file skipping for ``seek`` and co-partitioned joins.

Edge tables: (shape_id long, edge_id long, dim int,
              v0x,v0y,v0z,v1x,v1y,v1z double).
Index tables: (cell_id long, shape_id long, edge_id long).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions import cell_id_from_xyz, cell_parent, unsigned_sort_key
from ..kernels import latlng as lk
from ..kernels import predicates as pred

INDEX_LEVEL = 15  # mutable_shape_index.rs:169-193

EDGES_SCHEMA = StructType(
    [
        StructField("shape_id", LongType()),
        StructField("edge_id", LongType()),
        StructField("dim", IntegerType()),
        # chain ownership (shape.rs:56-101: Chain / ChainPosition) —
        # one shape may own several chains; edge ids are cumulative
        # over chains exactly like the reference chain_starts layout
        # (polyline_shape.rs:75-92, polygon_shape.rs:81-95)
        StructField("chain_id", LongType()),
        StructField("chain_offset", LongType()),
        StructField("v0x", DoubleType()),
        StructField("v0y", DoubleType()),
        StructField("v0z", DoubleType()),
        StructField("v1x", DoubleType()),
        StructField("v1y", DoubleType()),
        StructField("v1z", DoubleType()),
    ]
)


def _chain_edge_rows(sid: int, chains: list, dim: int,
                     closed: bool) -> list[tuple]:
    rows = []
    edge_id = 0  # cumulative chain_starts layout
    for chain_id, pts in enumerate(chains):
        lat = lk.degrees_to_radians(
            np.array([p[0] for p in pts], np.float64))
        lng = lk.degrees_to_radians(
            np.array([p[1] for p in pts], np.float64))
        x, y, z = lk.latlng_to_xyz(lat, lng)
        n = len(pts)
        n_edges = n if closed else max(0, n - 1)
        for e in range(n_edges):
            ne = (e + 1) % n
            rows.append(
                (sid, edge_id, dim, chain_id, e,
                 float(x[e]), float(y[e]), float(z[e]),
                 float(x[ne]), float(y[ne]), float(z[ne]))
            )
            edge_id += 1
    return rows


def edges_from_loops(spark: SparkSession, loops: dict[str, list],
                     dim: int = 2) -> DataFrame:
    """Fixture loops (name -> [(lat_deg, lng_deg), ...]) -> edge table;
    vertex conversion matches make_loop_from_degrees
    (tests/test_s2loop_port.rs:144-153).  One chain per shape
    (S2LoopShape, polygon_shape.rs:13-67)."""
    rows = []
    for sid, (name, pts) in enumerate(sorted(loops.items())):
        rows.extend(_chain_edge_rows(sid, [pts], dim, closed=True))
    return spark.createDataFrame(rows, EDGES_SCHEMA)


def edges_from_chains(spark: SparkSession,
                      shapes: dict[str, list[list]],
                      dim: int = 1, closed: bool = False) -> DataFrame:
    """Multi-chain shape containers: one shape_id owns several chains
    (S2MultiPolylineShape polyline_shape.rs:66-199 for dim=1 open
    chains; S2PolygonShape / S2MultiPolygonShape polygon_shape.rs:
    78-158 for dim=2 closed loops).  Edge ids are cumulative over the
    chain list — the reference's chain_starts layout — and every edge
    carries (chain_id, chain_offset) = ChainPosition
    (shape.rs:82-101)."""
    rows = []
    for sid, (name, chains) in enumerate(sorted(shapes.items())):
        rows.extend(_chain_edge_rows(sid, chains, dim, closed))
    return spark.createDataFrame(rows, EDGES_SCHEMA)


def edges_from_points(spark: SparkSession,
                      shapes: dict[str, list]) -> DataFrame:
    """Point-cloud shapes (S2PointShape / S2MultiPointShape /
    S2PointCloudShape, point_shape.rs:12-160): every point is one
    DEGENERATE edge (v0 == v1, point_shape.rs:37/:84 Edge::new(point,
    point)), dim=0, all edges in the default single chain
    (shape.rs:159-172: num_chains == 1 covering [0, num_edges))."""
    rows = []
    for sid, (name, pts) in enumerate(sorted(shapes.items())):
        lat = lk.degrees_to_radians(
            np.array([p[0] for p in pts], np.float64))
        lng = lk.degrees_to_radians(
            np.array([p[1] for p in pts], np.float64))
        x, y, z = lk.latlng_to_xyz(lat, lng)
        for e in range(len(pts)):
            p = (float(x[e]), float(y[e]), float(z[e]))
            rows.append((sid, e, 0, 0, e, *p, *p))
    return spark.createDataFrame(rows, EDGES_SCHEMA)


def shape_chains(edges: DataFrame) -> DataFrame:
    """Chain accessor over the edge table: (shape_id, chain_id, start,
    length) — Chain::new(start, end - start) over the cumulative
    chain_starts layout (polyline_shape.rs:171-182,
    polygon_shape.rs:205-216).  One groupBy; validates at table scale
    because builders assign edge ids contiguously per chain."""
    return (
        edges.groupBy("shape_id", "chain_id")
        .agg(
            F.min("edge_id").alias("start"),
            F.count("*").alias("length"),
        )
        .orderBy("shape_id", "chain_id")
    )


def point_cloud_index(points: DataFrame, shape_col: str = "shape_id",
                      id_col: str = "point_id",
                      cell_col: str = "cell_id",
                      level: int = INDEX_LEVEL) -> DataFrame:
    """Table-scale point-cloud shape index: point_shape.rs:12-160
    lifted from the driver-side fixture builder (edges_from_points) to
    a DataFrame source, the shape point clouds actually take at scale.

    Every input row is one DEGENERATE edge (v0 == v1,
    point_shape.rs:37/:84) of its ``shape_col`` cloud; edge ids are the
    within-shape ``id_col`` order (cumulative over the single default
    chain, shape.rs:159-172), and each edge lands in its v0 leaf's
    level-15 parent cell (mutable_shape_index.rs:169-193).

    Returns the clipped-shape roll-up (shape_id, cell_id, n_edges,
    min_edge_id, max_edge_id).  Scale shape: one window shuffle on
    shape_id for edge ranks + one partial-agg shuffle on (shape, cell)
    — the parent-cell math is a codegen bit expression, no Python.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(shape_col).orderBy(id_col)
    edges = points.withColumn(
        "edge_id", (F.row_number().over(w) - 1).cast("long")
    )
    return (
        edges.withColumn("_icell", cell_parent(cell_col, level))
        .groupBy(shape_col, "_icell")
        .agg(
            F.count("*").alias("n_edges"),
            F.min("edge_id").alias("min_edge_id"),
            F.max("edge_id").alias("max_edge_id"),
        )
        .withColumnRenamed("_icell", "index_cell_id")
    )


def build_shape_index(edges: DataFrame) -> DataFrame:
    """(cell_id, shape_id, edge_id) rows, Hilbert-sorted.

    Mirror of index_shape (mutable_shape_index.rs:119-166): covering
    cells from v0 leaf parents at level 15, all edges per cell."""
    with_cell = edges.withColumn(
        "_leaf", cell_id_from_xyz("v0x", "v0y", "v0z")
    ).withColumn("cell_id", cell_parent("_leaf", INDEX_LEVEL))
    covering = with_cell.select("shape_id", "cell_id").distinct()
    index = covering.join(
        edges.select("shape_id", "edge_id"), "shape_id"
    ).select("cell_id", "shape_id", "edge_id")
    return index.sortWithinPartitions(unsigned_sort_key("cell_id")).sort(
        unsigned_sort_key("cell_id")
    )


def seek(index: DataFrame, target_cell_id: int, n: int = 100) -> DataFrame:
    """Iterator seek (shape_index.rs:284-287): ordered scan from the
    first indexed cell >= target.  On a sorted parquet/Iceberg table the
    unsigned-key filter prunes via min/max file stats."""
    tkey = np.int64(np.uint64(target_cell_id) ^ np.uint64(1 << 63))
    return (
        index.filter(unsigned_sort_key("cell_id") >= int(tkey))
        .orderBy(unsigned_sort_key("cell_id"))
        .limit(n)
    )


def query_point_candidates(index: DataFrame, points: DataFrame,
                           cell_col: str = "cell_id") -> DataFrame:
    """Index lookup for points: shapes whose covering contains the
    point's level-15 ancestor (reference query path: BTreeMap lookup at
    the index cell).  Pure equi-join on a bit-expression key."""
    pts = points.withColumn("_anc15", cell_parent(cell_col, INDEX_LEVEL))
    idx = index.select(
        F.col("cell_id").alias("_icell"), "shape_id"
    ).distinct()
    return pts.join(
        F.broadcast(idx), pts["_anc15"] == idx["_icell"]
    ).drop("_anc15", "_icell")


_CROSS_SCHEMA_FIELDS = [
    StructField("a_shape", LongType()),
    StructField("a_edge", LongType()),
    StructField("b_shape", LongType()),
    StructField("b_edge", LongType()),
    StructField("crossing", IntegerType()),
]


def edge_crossing_join(edges_a: DataFrame, edges_b: DataFrame,
                       candidates_via_index: bool = True,
                       candidate_level: int = INDEX_LEVEL,
                       with_chains: bool = False) -> DataFrame:
    """Edge-crossing join (SURVEY.md §2.5): candidate pairs via shared
    index cell at ``candidate_level`` (default 15 = reference parity,
    mutable_shape_index.rs:169-193), refined with the reference's
    crossing_sign (predicates.rs:666-682, returns only +1/-1).

    The index path is the scale path: candidate generation is a pure
    hash equi-join on a codegen bit-expression key — no cross join ever
    touches the big sides.  Each edge owns exactly one v0-parent cell,
    so the join emits each candidate pair once (no dedup needed).
    candidates_via_index=False: exact all-pairs (broadcast the smaller
    side) — kept ONLY as the pytest oracle for index-path recall; never
    use it in production plans (O(n*m)).

    with_chains=True propagates each side's chain id into the output
    (a_chain/b_chain — ChainPosition.chain_id, shape.rs:82-101) for
    multi-chain shape containers."""
    a_keys = [F.col("shape_id").alias("a_shape"),
              F.col("edge_id").alias("a_edge")]
    b_keys = [F.col("shape_id").alias("b_shape"),
              F.col("edge_id").alias("b_edge")]
    if with_chains:
        a_keys.append(F.col("chain_id").alias("a_chain"))
        b_keys.append(F.col("chain_id").alias("b_chain"))
    a = edges_a.select(
        *a_keys,
        *[F.col(c).alias(f"a_{c}") for c in ("v0x", "v0y", "v0z", "v1x", "v1y", "v1z")],
    )
    b = edges_b.select(
        *b_keys,
        *[F.col(c).alias(f"b_{c}") for c in ("v0x", "v0y", "v0z", "v1x", "v1y", "v1z")],
    )
    if candidates_via_index:
        a = a.withColumn(
            "_cell", cell_parent(cell_id_from_xyz("a_v0x", "a_v0y", "a_v0z"),
                                 candidate_level)
        )
        b = b.withColumn(
            "_cell", cell_parent(cell_id_from_xyz("b_v0x", "b_v0y", "b_v0z"),
                                 candidate_level)
        )
        pairs = a.join(b, "_cell").drop("_cell")
    else:
        pairs = a.crossJoin(F.broadcast(b))

    id_cols = ["a_shape", "a_edge", "b_shape", "b_edge"]
    if with_chains:
        id_cols += ["a_chain", "b_chain"]

    # Crossing sign as an Arrow pandas_udf over ONLY the 12 coordinate
    # columns (one way, one int back) — the id columns never cross
    # Arrow and the coordinates never come back (the old mapInPandas
    # shipped 16-18 columns both directions; the Arrow round-trip, not
    # the kernel, dominates — same finding as the PIP refine).
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    coord_cols = ["a_v0x", "a_v0y", "a_v0z", "a_v1x", "a_v1y", "a_v1z",
                  "b_v0x", "b_v0y", "b_v0z", "b_v1x", "b_v1y", "b_v1z"]

    @_pandas_udf(IntegerType())
    def _crossing(*cols: pd.Series) -> pd.Series:
        n = len(cols[0])
        if not n:
            return pd.Series(np.empty(0, np.int32))
        m = np.empty((n, 12), dtype=np.float64)
        for j, s in enumerate(cols):
            m[:, j] = s.to_numpy(np.float64)
        cr = pred.crossing_sign_batch(m[:, 0:3], m[:, 3:6],
                                      m[:, 6:9], m[:, 9:12])
        return pd.Series(cr.astype(np.int32))

    return pairs.select(
        *id_cols,
        _crossing(*[F.col(c) for c in coord_cols]).alias("crossing"),
    )


CHAIN_CROSS_SCHEMA = StructType(
    [
        StructField("line_id", LongType()),
        StructField("shape_id", LongType()),
        StructField("n_crossing_edges", IntegerType()),
        StructField("n_vertex_touches", IntegerType()),
    ]
)


def polyline_edge_crossings(polylines: DataFrame, edges: DataFrame,
                            max_cells: int = 16,
                            index_level: int = INDEX_LEVEL) -> DataFrame:
    """Chain-crossing join: polylines vs indexed shape edges using the
    S2EdgeCrosser chain state (edge_crosser.rs:106-170 semantics via
    kernels.edge_crosser.crossing_signs_chain — each chain vertex is
    tested ONCE per fixed edge, not once per chain edge pair).

    polylines: (line_id long, vertices array<struct<lat,lng>> degrees).
    edges: EDGES_SCHEMA shape-edge table.

    Candidates come from the shape index (v0-parent cells at the
    reference's pinned level 15, ancestors included so coarse polyline
    covering cells match), so the join is hash-equi on cell ids —
    scale-shaped like every other join here.  Refine groups by
    (line_id, shape_id): one applyInPandas group walks the polyline
    chain once per candidate shape edge, counting proper crossings (+1)
    and shared-vertex touches (0) per the crosser's sign contract.

    Output: (line_id, shape_id, n_crossing_edges, n_vertex_touches).
    """
    from ..functions import unsigned_sort_key  # noqa: F401  (doc pointer)
    from .polyline_join import _ancestors_and_self, polyline_coverings

    lines_str = polylines.select(
        F.col("line_id").cast("long").alias("line_id"), "vertices"
    )
    cov = polyline_coverings(
        lines_str.select(F.col("line_id").cast("string").alias("line_id"),
                         "vertices"),
        max_cells=max_cells,
    ).select(F.col("line_id").cast("long").alias("line_id"), "cell_id")
    idx = edges.withColumn(
        "_icell",
        cell_parent(cell_id_from_xyz("v0x", "v0y", "v0z"), index_level),
    ).select("shape_id", "_icell").distinct()
    # overlap in id space: ancestor-or-equal either direction
    cov_anc = cov.select(
        "line_id", F.explode(_ancestors_and_self("cell_id")).alias("_c")
    )
    idx_anc = idx.select(
        "shape_id", F.explode(_ancestors_and_self("_icell")).alias("_c")
    )
    cand = (
        cov.select("line_id", F.col("cell_id").alias("_c"))
        .join(idx_anc, "_c")
        .select("line_id", "shape_id")
        .unionByName(
            cov_anc.join(
                idx.select("shape_id", F.col("_icell").alias("_c")), "_c"
            ).select("line_id", "shape_id")
        )
        .dropDuplicates(["line_id", "shape_id"])
    )

    pair_edges = cand.join(edges, "shape_id").join(lines_str, "line_id")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import edge_crosser as ec
        from ..kernels import latlng as lk2

        line_id = pdf["line_id"].iloc[0]
        shape_id = pdf["shape_id"].iloc[0]
        verts = pdf["vertices"].iloc[0]
        lat = lk2.degrees_to_radians(
            np.array([v["lat"] for v in verts], np.float64))
        lng = lk2.degrees_to_radians(
            np.array([v["lng"] for v in verts], np.float64))
        x, y, z = lk2.latlng_to_xyz(lat, lng)
        chain = np.stack([x, y, z], axis=-1)
        n_cross = 0
        n_touch = 0
        if len(chain) >= 2:
            # one batched (m_edges x chain) kernel call per group —
            # no per-edge Python loop
            v0 = pdf[["v0x", "v0y", "v0z"]].to_numpy(np.float64)
            v1 = pdf[["v1x", "v1y", "v1z"]].to_numpy(np.float64)
            signs = ec.crossing_signs_chain_batch(v0, v1, chain)
            n_cross = int(np.count_nonzero((signs > 0).any(axis=1)))
            n_touch = int(np.count_nonzero((signs == 0).any(axis=1)))
        return pd.DataFrame(
            {
                "line_id": [line_id],
                "shape_id": [shape_id],
                "n_crossing_edges": [n_cross],
                "n_vertex_touches": [n_touch],
            }
        )

    return pair_edges.groupBy("line_id", "shape_id").applyInPandas(
        fn, CHAIN_CROSS_SCHEMA
    )


def remove_shape(index: DataFrame, shape_id: int) -> DataFrame:
    """Incremental removal (mutable_shape_index.rs:280-296 API).

    The reference's remove_shape_from_index body (:201-219) is a
    placeholder that drops EVERY cell and flags a full rebuild; the
    engine implements what its TODO intends — delete exactly the
    shape's postings.  On an Iceberg index table this is
    ``DELETE FROM index WHERE shape_id = ?`` (a metadata-only
    positional delete); here it is the equivalent filter."""
    return index.filter(F.col("shape_id") != shape_id)


def add_shapes(index: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental add (mutable_shape_index.rs:259-277): index the new
    shapes' edges and merge — equivalent to MERGE INTO on an Iceberg
    index table.  The result is re-sorted by the unsigned cell key so
    range reads keep pruning."""
    added = build_shape_index(new_edges)
    return (
        index.unionByName(added)
        .sortWithinPartitions(unsigned_sort_key("cell_id"))
        .sort(unsigned_sort_key("cell_id"))
    )
