"""Stateful streaming geofence: per-trajectory tile enter/exit
detection with ``applyInPandasWithState`` — the streaming twin of
operators/tiling.tile_transitions, emitting one row per boundary
crossing AS IT HAPPENS instead of a batch edge rollup.

State per trajectory is just (last_tile, last_seq): a crossing that
spans two micro-batches is caught only through the stored state, which
is exactly what the multi-batch test exercises.  State size is one row
per live trajectory; pair it with a timeout in production if
trajectories end silently.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..functions import cell_id_from_latlng_deg, cell_parent

TRANSITION_SCHEMA = StructType(
    [
        StructField("traj_id", LongType()),
        StructField("seq", LongType()),
        StructField("from_tile", LongType()),
        StructField("to_tile", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_tile", LongType()),
        StructField("last_seq", LongType()),
    ]
)


def streaming_tile_transitions(fix_stream: DataFrame,
                               level: int = 8) -> DataFrame:
    """fix_stream: streaming DF with (traj_id, seq, lat, lng).
    Returns a streaming DF of (traj_id, seq, from_tile, to_tile) — one
    row per tile-boundary crossing, including crossings whose previous
    fix arrived in an earlier micro-batch (carried through state).

    Within a batch, fixes fold in seq order; out-of-order arrivals
    ACROSS batches are ignored (seq <= stored last_seq), the standard
    at-the-edge trade for unwatermarked per-key state.
    """
    s = fix_stream.withColumn(
        "_tile", cell_parent(cell_id_from_latlng_deg("lat", "lng"), level)
    ).select("traj_id", "seq", F.col("_tile").alias("tile"))

    def fold(key: Any, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        traj_id = key[0]
        if state.exists:
            last_tile, last_seq = state.get
        else:
            last_tile, last_seq = None, None
        out: list[tuple[int, int, int, int]] = []
        # applyInPandasWithState delivers a large group as MULTIPLE
        # unordered Arrow chunks; sorting per chunk would let a
        # lower-seq fix in a later chunk hit the staleness guard and
        # be dropped.  Concatenate the whole group, sort once.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        if batch is not None:
            for r in batch.sort_values("seq").itertuples(index=False):
                if last_seq is not None and r.seq <= last_seq:
                    continue
                if last_tile is not None and r.tile != last_tile:
                    out.append((traj_id, int(r.seq), int(last_tile),
                                int(r.tile)))
                last_tile, last_seq = int(r.tile), int(r.seq)
        if last_seq is not None:
            state.update((last_tile, last_seq))
        yield pd.DataFrame(
            out, columns=["traj_id", "seq", "from_tile", "to_tile"]
        )

    return s.groupBy("traj_id").applyInPandasWithState(
        fold,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
