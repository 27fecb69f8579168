"""Token round-trip and E-notation conversions at the Spark surface."""

import numpy as np
import pandas as pd

from s2_geometry_rust_spark.functions import (
    cell_from_token,
    cell_token,
    degrees_to_e,
    e_to_degrees,
)
from s2_geometry_rust_spark.kernels import cellid as ck
from s2_geometry_rust_spark.operators.unions_ops import expand_grouped
from s2_geometry_rust_spark.kernels import unions as ku


def _random_ids(n, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leaf = ck.from_point(v[:, 0], v[:, 1], v[:, 2])
    return ck.parent(leaf, rng.integers(0, 31, size=n))


def test_token_roundtrip_spark(spark):
    ids = _random_ids(1000)
    df = spark.createDataFrame(pd.DataFrame({"id": ids.view(np.int64)}))
    out = (
        df.withColumn("tok", cell_token("id"))
        .withColumn("back", cell_from_token("tok"))
        .toPandas()
    )
    np.testing.assert_array_equal(
        out["back"].to_numpy(np.int64), out["id"].to_numpy(np.int64)
    )
    # token order == id order (cell_id.rs:367 invariant)
    srt = out.sort_values("tok")
    np.testing.assert_array_equal(
        srt["id"].to_numpy(np.int64).view(np.uint64),
        np.sort(out["id"].to_numpy(np.int64).view(np.uint64)),
    )


def test_e_notation_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"deg": [0.0, 45.123456789, -89.9999999, 12.25]})
    )
    out = (
        df.withColumn("e7", degrees_to_e("deg", 7))
        .withColumn("back", e_to_degrees("e7", 7))
        .toPandas()
    )
    # E7 resolution: back within 5e-8 degrees
    assert (np.abs(out.back - out.deg) <= 5.0e-8 + 1e-12).all()
    # exact values expressible in E7 round-trip exactly
    assert out.loc[3, "e7"] == 122500000
    assert out.loc[3, "back"] == 12.25


def test_expand_grouped_matches_kernel(spark):
    ids = ku.normalize(_random_ids(30, seed=9))
    df = spark.createDataFrame(
        [("u", int(np.uint64(i).astype(np.int64))) for i in ids],
        "union_id string, cell_id long",
    )
    got = np.sort(
        expand_grouped(df, 8).toPandas()["cell_id"].to_numpy(np.int64).view(np.uint64)
    )
    want = np.sort(np.asarray(ku.expand(ids, 8), np.uint64))
    np.testing.assert_array_equal(got, want)
