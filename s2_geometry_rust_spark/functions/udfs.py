"""Arrow-batched pandas UDFs wrapping the numpy geometry kernels.

Only conversions that genuinely need the Hilbert tables / cube-face
projection live here (cell_id.rs:175-238, 421-480); everything else is a
JVM Column expression in ``columns.py``.  All UDFs are Series->Series
(vectorized, zero per-row Python) per the input_hint mandate.

u64 -> int64 boundary: ids computed as numpy uint64 are reinterpreted via
``.view(int64)`` so the bit pattern is preserved exactly.

UDF objects are built lazily (pandas_udf needs an active SparkSession to
resolve return types) and cached per process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..kernels import cellid as ck
from ..kernels import latlng as lk

_cache: dict[str, object] = {}


def _u64_to_i64(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint64).view(np.int64)


def _i64_to_u64(s: pd.Series) -> np.ndarray:
    return np.ascontiguousarray(s.to_numpy(dtype=np.int64)).view(np.uint64)


def _get(name: str):
    if name in _cache:
        return _cache[name]

    if name == "cell_id_from_xyz":

        def fn(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
            ids = ck.from_point(
                x.to_numpy(dtype=np.float64),
                y.to_numpy(dtype=np.float64),
                z.to_numpy(dtype=np.float64),
            )
            return pd.Series(_u64_to_i64(ids))

        udf = pandas_udf(fn, LongType())

    elif name == "cell_id_from_latlng_deg":

        def fn(lat: pd.Series, lng: pd.Series) -> pd.Series:
            lat_r = lk.degrees_to_radians(lat.to_numpy(dtype=np.float64))
            lng_r = lk.degrees_to_radians(lng.to_numpy(dtype=np.float64))
            x, y, z = lk.latlng_to_xyz(lat_r, lng_r)
            return pd.Series(_u64_to_i64(ck.from_point(x, y, z)))

        udf = pandas_udf(fn, LongType())

    elif name == "cell_from_token":

        def fn(tokens: pd.Series) -> pd.Series:
            ids = ck.from_token(tokens.to_numpy(dtype=object))
            return pd.Series(_u64_to_i64(ids))

        udf = pandas_udf(fn, LongType())

    elif name == "cell_center_xyz":
        schema = StructType(
            [
                StructField("x", DoubleType()),
                StructField("y", DoubleType()),
                StructField("z", DoubleType()),
            ]
        )

        def fn(ids: pd.Series) -> pd.DataFrame:
            x, y, z = ck.to_point_raw(_i64_to_u64(ids))
            return pd.DataFrame({"x": x, "y": y, "z": z})

        udf = pandas_udf(fn, schema)

    else:  # pragma: no cover
        raise KeyError(name)

    _cache[name] = udf
    return udf


def cell_id_from_xyz(x, y, z) -> Column:
    """Leaf cell id (level 30) from a unit-sphere point
    (cell_id.rs:175-238, linear-ST path)."""
    return _get("cell_id_from_xyz")(x, y, z)


def cell_id_from_latlng_deg(lat, lng) -> Column:
    """Leaf cell id from degrees: from_degrees().to_point() then
    from_point (latlng.rs:59-64,207-227 + cell_id.rs:175-178)."""
    return _get("cell_id_from_latlng_deg")(lat, lng)


def cell_center_xyz(ids) -> Column:
    """Approximate cell-center point (cell_id.rs:421-480 semantics)."""
    return _get("cell_center_xyz")(ids)


def cell_from_token(tokens) -> Column:
    """Token -> cell id (cell_id.rs:394-416; invalid tokens -> 0)."""
    return _get("cell_from_token")(tokens)
