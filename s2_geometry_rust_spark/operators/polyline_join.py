"""Polyline-intersection join: which polylines cross which.

Filter-and-refine like the point join:

1. per-line bounding cap (centroid + max vertex angle) computed in one
   mapInPandas pass — three doubles + a radius per line;
2. candidate pairs via the cap triangle inequality
   ``angle(c_a, c_b) <= r_a + r_b`` — pure codegen arithmetic on the
   broadcast smaller side (the same exactly-rounded ops the distance
   join uses);
3. exact refine with the reference's pairwise crossing semantics
   (polyline.rs:316-338 via kernels.polylines.intersects) in one
   mapInPandas over the joined vertex arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import latlng as lk
from ..kernels import polylines as pk

_CAP_SCHEMA = StructType(
    [
        StructField("line_id", StringType()),
        StructField("cx", DoubleType()),
        StructField("cy", DoubleType()),
        StructField("cz", DoubleType()),
        StructField("cos_r", DoubleType()),
    ]
)


def _verts_xyz(row_vertices) -> np.ndarray:
    lat = lk.degrees_to_radians(
        np.array([v["lat"] for v in row_vertices], np.float64)
    )
    lng = lk.degrees_to_radians(
        np.array([v["lng"] for v in row_vertices], np.float64)
    )
    x, y, z = lk.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=-1)


def with_bounding_caps(polylines: DataFrame) -> DataFrame:
    """(line_id, cx, cy, cz, cos_r): centroid direction + cos of the max
    vertex angle (cos kept so the candidate filter needs no acos)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k.name: [] for k in _CAP_SCHEMA.fields}
            for _, row in b.iterrows():
                v = _verts_xyz(row["vertices"])
                c = v.mean(axis=0)
                n = np.linalg.norm(c)
                c = c / n if n > 0 else np.array([1.0, 0.0, 0.0])
                cos_r = float(np.clip(v @ c, -1.0, 1.0).min())
                out["line_id"].append(row["line_id"])
                out["cx"].append(float(c[0]))
                out["cy"].append(float(c[1]))
                out["cz"].append(float(c[2]))
                out["cos_r"].append(cos_r)
            yield pd.DataFrame(out)

    return polylines.select("line_id", "vertices").mapInPandas(run, _CAP_SCHEMA)


def polyline_intersection_join(lines_a: DataFrame, lines_b: DataFrame
                               ) -> DataFrame:
    """(a_id, b_id, crossing) for candidate pairs whose bounding caps
    meet; ``crossing`` is the exact reference decision.  lines_*:
    (line_id, vertices array<struct<lat,lng>> degrees)."""
    caps_a = with_bounding_caps(lines_a).withColumnRenamed("line_id", "a_id")
    caps_b = with_bounding_caps(lines_b).withColumnRenamed("line_id", "b_id")
    a = lines_a.select(
        F.col("line_id").alias("a_id"), F.col("vertices").alias("_va")
    ).join(caps_a, "a_id")
    b = lines_b.select(
        F.col("line_id").alias("b_id"), F.col("vertices").alias("_vb")
    ).join(
        caps_b.withColumnRenamed("cx", "bx").withColumnRenamed("cy", "by")
        .withColumnRenamed("cz", "bz").withColumnRenamed("cos_r", "b_cos_r"),
        "b_id",
    )
    # caps intersect iff angle(ca, cb) <= r_a + r_b; with cosines:
    # cos(angle) >= cos(r_a + r_b) = ca*cb - sa*sb
    dot = (
        F.col("cx") * F.col("bx")
        + F.col("cy") * F.col("by")
        + F.col("cz") * F.col("bz")
    )
    sin_a = F.sqrt(F.greatest(F.lit(0.0), 1.0 - F.col("cos_r") * F.col("cos_r")))
    sin_b = F.sqrt(
        F.greatest(F.lit(0.0), 1.0 - F.col("b_cos_r") * F.col("b_cos_r"))
    )
    cos_sum = F.col("cos_r") * F.col("b_cos_r") - sin_a * sin_b
    # cos(r_a + r_b) is only a valid lower bound while r_a + r_b < pi;
    # past that the caps jointly cover every direction, so every pair is
    # a candidate.  r_a + r_b >= pi  <=>  cos_r + b_cos_r <= 0 (each
    # radius is in [0, pi] so cos(r_a) <= -cos(r_b) iff r_a >= pi - r_b).
    caps_cover_sphere = (F.col("cos_r") + F.col("b_cos_r")) <= F.lit(0.0)
    pairs = a.join(
        F.broadcast(b), (dot >= cos_sum - F.lit(1e-12)) | caps_cover_sphere
    )

    schema = StructType(
        [
            StructField("a_id", StringType()),
            StructField("b_id", StringType()),
            StructField("crossing", BooleanType()),
        ]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for p in batches:
            out = {"a_id": [], "b_id": [], "crossing": []}
            for _, row in p.iterrows():
                va = _verts_xyz(row["_va"])
                vb = _verts_xyz(row["_vb"])
                out["a_id"].append(row["a_id"])
                out["b_id"].append(row["b_id"])
                out["crossing"].append(bool(pk.intersects(va, vb)))
            yield pd.DataFrame(out)

    return pairs.select("a_id", "b_id", "_va", "_vb").mapInPandas(
        refine, schema
    ).filter(F.col("crossing"))
