"""Scale soak for the S2Builder table operators: many graphs x many
edges through snap -> graph build -> chain reassembly, with sampled
exactness vs the driver-side facade (which mirrors the reference
algorithms verbatim).

Run: python tools/builder_soak.py [n_graphs] [edges_per_graph] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_graphs: int = 1000, edges_per_graph: int = 1000,
         cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.builder import (
        GraphOptions,
        SnapFunction,
        assemble_polylines,
        build_graph,
    )
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("builder-soak", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_edges = n_graphs * edges_per_graph

    # deterministic random chains: per graph, a random walk on the
    # sphere (consecutive edges share vertices, so snapping merges
    # plenty) — synthesized distributed, no driver materialization
    df = (
        spark.range(n_edges, numPartitions=cpus * 4)
        .withColumn("graph", F.concat(F.lit("g"),
                                      (F.col("id") % n_graphs).cast("string")))
        .withColumn("edge_ord", F.col("id"))
        .withColumn("edge_type", F.lit("directed"))
    )

    import pandas as pd
    from collections.abc import Iterator

    from pyspark.sql.types import DoubleType, StructField, StructType

    fields = df.schema.fields + [
        StructField(c, DoubleType())
        for c in ("sx", "sy", "sz", "tx", "ty", "tz")
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            ids = b["id"].to_numpy(np.int64)
            # splitmix-ish per-edge seeds -> two unit vectors; edge i's
            # target == edge i+1's source within a graph (walk)
            def unit(seed_ids):
                h = (seed_ids.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15))
                out = np.empty((len(seed_ids), 3))
                for k in range(3):
                    hk = (h + np.uint64(k)) * np.uint64(0xBF58476D1CE4E5B9)
                    hk ^= hk >> np.uint64(31)
                    out[:, k] = (hk.astype(np.float64)
                                 / 2**64) * 2.0 - 1.0
                out /= np.linalg.norm(out, axis=1)[:, None]
                return out
            v0 = unit(ids)
            v1 = unit(ids + np.int64(1))
            b = b.copy()
            b["sx"], b["sy"], b["sz"] = v0[:, 0], v0[:, 1], v0[:, 2]
            b["tx"], b["ty"], b["tz"] = v1[:, 0], v1[:, 1], v1[:, 2]
            yield b

    edges = df.mapInPandas(gen, StructType(fields))
    # graph-local edge_ord (the walk gives unique ords already)
    snap = SnapFunction("cellid", level=8)

    t0 = time.time()
    vertices, gedges = build_graph(edges, snap, GraphOptions(),
                                   materialize_snapped=True)
    vertices = vertices.localCheckpoint(eager=True)
    gedges = gedges.localCheckpoint(eager=True)
    nv, ne = vertices.count(), gedges.count()
    t_build = time.time() - t0

    t0 = time.time()
    chains = assemble_polylines(gedges, vertices, mode="vector")
    nc = chains.count()
    t_chains = time.time() - t0

    # sampled exactness: rebuild 3 graphs locally with the facade logic
    sample_graphs = [f"g{i}" for i in (0, n_graphs // 2, n_graphs - 1)]
    from s2_geometry_rust_spark.kernels import snap as sk

    for gname in sample_graphs:
        rows = (
            edges.filter(F.col("graph") == gname)
            .orderBy("edge_ord")
            .collect()
        )
        # local reference build (drop semantics — mirrors build_graph)
        points, key_to_vid, local_edges = [], {}, {}
        for r in rows:
            a = snap.snap_point(np.float64(r["sx"]), np.float64(r["sy"]),
                                np.float64(r["sz"]))
            bb = snap.snap_point(np.float64(r["tx"]), np.float64(r["ty"]),
                                 np.float64(r["tz"]))
            ang = float(sk.point_angle(a[0], a[1], a[2],
                                       bb[0], bb[1], bb[2]))
            if ang < sk.DEGENERATE_EDGE_ANGLE:
                continue
            vids = []
            for pnt in (a, bb):
                key = tuple(int(np.float64(c).view(np.int64)) for c in pnt)
                vid = key_to_vid.setdefault(key, len(points))
                if vid == len(points):
                    points.append(pnt)
                vids.append(vid)
            k = (vids[0], vids[1])
            local_edges.setdefault(k, 0)
            local_edges[k] += 1
        got_v = vertices.filter(F.col("graph") == gname).count()
        got_e = {
            (r["src_vid"], r["dst_vid"]): r["n_inputs"]
            for r in gedges.filter(F.col("graph") == gname).collect()
        }
        assert got_v == len(points), (gname, got_v, len(points))
        assert got_e == local_edges, gname

    print({
        "n_graphs": n_graphs, "input_edges": n_edges,
        "vertices": nv, "graph_edges": ne, "chains": nc,
        "build_sec": round(t_build, 1),
        "assemble_sec": round(t_chains, 1),
        "edges_per_sec_build": round(n_edges / t_build, 0),
        "sampled_graphs_exact": len(sample_graphs),
    })
    spark.stop()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
