"""Tiling: assign points to fixed-level cells ("tiles") and aggregate.

Tile id = ``parent_at_level(cell_id, level)`` (cell_id.rs:651-657) — a
pure bit expression, so tile assignment runs inside whole-stage codegen
and the groupBy benefits from map-side partial aggregation.  At 100 TB
this is scan -> codegen project -> partial agg -> single shuffle on
tile_id -> final agg; no Python in the path once cell_id exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import cell_parent, cell_token, unsigned_sort_key


def with_tile(points: DataFrame, level: int,
              cell_col: str = "cell_id", out_col: str = "tile_id") -> DataFrame:
    return points.withColumn(out_col, cell_parent(cell_col, level))


def tile_counts(points: DataFrame, level: int,
                cell_col: str = "cell_id") -> DataFrame:
    """Docs per tile at the given level, Hilbert-ordered.

    One shuffle (on tile_id); partial aggregation happens map-side.
    Output: (tile_id, tile_token, n_points).
    """
    return (
        with_tile(points, level, cell_col)
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
        .withColumn("tile_token", cell_token("tile_id"))
        .select("tile_id", "tile_token", "n_points")
        .orderBy(unsigned_sort_key("tile_id"))
    )


def tile_pyramid(points: DataFrame, levels: tuple[int, ...] = (4, 8, 12),
                 cell_col: str = "cell_id") -> DataFrame:
    """Multi-level tile-count pyramid in ONE pass: counts per tile at
    every requested level via GROUPING SETS (Expand + partial agg + a
    single shuffle) instead of one scan-and-shuffle per level.  At
    100 TB the difference is len(levels) full input scans.

    Parent-at-level is the pure bit expression of cell_id.rs:297-305,
    so the Expand rows stay inside whole-stage codegen; partial
    aggregation collapses them map-side before the exchange (tile
    cardinality << point cardinality at every level).

    Output: (level:int, tile_id:long, tile_token:string, n_points).
    Cell ids are never null, so a grouping-set null unambiguously marks
    "this row belongs to another level's set".
    """
    parents = {lv: f"_p{lv}" for lv in levels}
    d = points
    for lv, c in parents.items():
        d = d.withColumn(c, cell_parent(cell_col, lv))
    sets = [[c] for c in parents.values()]
    agg = d.groupingSets(sets, *parents.values()).agg(
        F.count("*").alias("n_points")
    )
    level = None
    for lv, c in parents.items():
        cond = F.when(F.col(c).isNotNull(), F.lit(lv))
        level = cond if level is None else level.when(
            F.col(c).isNotNull(), F.lit(lv)
        )
    tile = F.coalesce(*[F.col(c) for c in parents.values()])
    return agg.select(
        level.cast("int").alias("level"),
        tile.alias("tile_id"),
        cell_token(tile).alias("tile_token"),
        "n_points",
    )


def raster_vector_join(raster_tiles: DataFrame, points: DataFrame,
                       level: int, cell_col: str = "cell_id",
                       tile_col: str = "tile_id") -> DataFrame:
    """Raster-tile <-> vector join: equi-join on parent-at-level
    (SURVEY.md §2.5).  A plain hash join on tile_id; Catalyst/AQE picks
    broadcast when the raster side is small, and AQE skew-join splits
    hot tiles (backstopped by explicit salting in plans.salting)."""
    pts = with_tile(points, level, cell_col, tile_col)
    return pts.join(raster_tiles, tile_col)


def hex_tile_counts_geo(points: DataFrame, res: int = 3,
                        lat_col: str = "lat",
                        lng_col: str = "lng") -> DataFrame:
    """Per-hex-cell counts of geo points (lat/lng degrees) — the
    aperture-7 twin of tile_counts; one shuffle, all JVM."""
    from ..functions.hexcols import with_hex_from_latlng

    return (
        with_hex_from_latlng(points, lat_col, lng_col, res, keep=[])
        .groupBy("hex_id")
        .agg(F.count("*").alias("n_points"))
    )


def tile_transitions(points: DataFrame, level: int = 8,
                     traj_col: str = "traj_id", seq_col: str = "seq",
                     cell_col: str = "cell_id") -> DataFrame:
    """Tile-boundary crossing flows: for every trajectory, each
    consecutive fix pair whose parent tiles differ emits one
    (from_tile -> to_tile) edge; edges are counted across all
    trajectories — the geofence / flow-graph primitive.

    ONE shuffle on traj_col feeds the lag window; the edge count is a
    second (much smaller) shuffle on the tile pair.  Tile math is
    codegen bit ops.

    Output: (from_tile, from_token, to_tile, to_token, n_transitions).
    """
    from pyspark.sql import Window

    d = with_tile(points, level, cell_col)
    w = Window.partitionBy(traj_col).orderBy(seq_col)
    d = d.withColumn("_prev", F.lag("tile_id").over(w))
    return (
        d.filter(F.col("_prev").isNotNull()
                 & (F.col("_prev") != F.col("tile_id")))
        .groupBy(F.col("_prev").alias("from_tile"),
                 F.col("tile_id").alias("to_tile"))
        .agg(F.count("*").alias("n_transitions"))
        .select(
            "from_tile", cell_token("from_tile").alias("from_token"),
            "to_tile", cell_token("to_tile").alias("to_token"),
            "n_transitions",
        )
    )


def od_matrix(points: DataFrame, level: int = 4,
              traj_col: str = "traj_id", seq_col: str = "seq",
              cell_col: str = "cell_id") -> DataFrame:
    """Origin-destination matrix: first-fix tile x last-fix tile counts
    per trajectory.  first/last ride min/max over (seq, tile) structs —
    pure aggregation (ONE shuffle on traj, map-side partial), no sort
    window; the OD count is a second tiny shuffle.

    Output: (origin_tile, origin_token, dest_tile, dest_token, n_trips).
    """
    d = with_tile(points, level, cell_col)
    pair = F.struct(F.col(seq_col).alias("s"), F.col("tile_id").alias("t"))
    od = d.groupBy(traj_col).agg(
        F.min(pair).alias("_o"), F.max(pair).alias("_d")
    )
    return (
        od.groupBy(F.col("_o.t").alias("origin_tile"),
                   F.col("_d.t").alias("dest_tile"))
        .agg(F.count("*").alias("n_trips"))
        .select(
            "origin_tile", cell_token("origin_tile").alias("origin_token"),
            "dest_tile", cell_token("dest_tile").alias("dest_token"),
            "n_trips",
        )
    )


def with_webmerc_tile(points: DataFrame, zoom: int = 6,
                      lat_col: str = "lat",
                      lng_col: str = "lng") -> DataFrame:
    """Web-mercator (slippy z/x/y) tile assignment — the raster web-map
    standard, complementing the S2 (quad) and aperture-7 (hex) tilers:

      xt = floor((lng + 180) / 360 * 2^z)
      yt = floor((1 - ln(tan(pi/4 + lat_rad/2)) / pi) / 2 * 2^z)

    with the standard +/-85.05112878 deg mercator clamp and the x/y
    edge clamp to 2^z - 1.  Pure JVM trig in whole-stage codegen.  The
    contract fixture keeps lat/lng on a 0.25-degree grid, far from any
    tile boundary, so the one libm-dependent step (ln(tan(...))) cannot
    flip an assignment across engines.
    """
    n = float(1 << zoom)
    lat = F.least(F.greatest(F.col(lat_col), F.lit(-85.05112878)),
                  F.lit(85.05112878))
    lat_rad = F.radians(lat)
    xt = F.floor((F.col(lng_col) + 180.0) / 360.0 * n)
    yt = F.floor(
        (F.lit(1.0)
         - F.log(F.tan(F.lit(0.7853981633974483) + lat_rad / 2.0))
         / F.lit(3.141592653589793)) / 2.0 * n
    )
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit((1 << zoom) - 1))  # noqa: E731
    return points.withColumns({
        "zoom": F.lit(zoom).cast("int"),
        "xtile": clamp(xt).cast("long"),
        "ytile": clamp(yt).cast("long"),
    })


def webmerc_tile_counts(points: DataFrame, zoom: int = 6,
                        lat_col: str = "lat",
                        lng_col: str = "lng") -> DataFrame:
    """Counts per web-mercator tile: one shuffle, map-side partials."""
    return (
        with_webmerc_tile(points, zoom, lat_col, lng_col)
        .groupBy("zoom", "xtile", "ytile")
        .agg(F.count("*").alias("n_points"))
    )


def hex_focal_counts(points: DataFrame, res: int = 2,
                     xyz=("x", "y", "z")) -> DataFrame:
    """Focal (neighborhood) smoothing on the hex grid: for every hex
    cell, the total point count over its 7-cell lattice disk (itself +
    6 ring-1 neighbors, face-local) — the raster "focal sum" / heatmap
    blur primitive.

    Scale shape: raw points collapse to per-hex counts FIRST (one
    shuffle with map-side partials); the 7x neighbor fan-out then runs
    on the counts table (tile-cardinality, millions of rows at
    planet scale, not the input), and the re-aggregation is a second
    tiny shuffle.  Never 7x the input.

    Output: (hex_id, focal_points) — includes empty cells that have
    occupied neighbors (their focal sum is the neighbor spill).
    """
    from ..functions.hexcols import (
        hex_face,
        hex_pack,
        hex_q,
        hex_r,
        with_hex_cell,
    )
    from ..kernels.hexgrid import disk_offsets

    pts = with_hex_cell(points, *xyz, res, keep=[])
    counts = pts.groupBy("hex_id").agg(F.count("*").alias("_n"))
    offs = F.array(*[
        F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
        for dq, dr in disk_offsets(1)
    ])
    spread = counts.select(
        hex_face("hex_id").alias("_f"),
        hex_q("hex_id").alias("_q"),
        hex_r("hex_id").alias("_r"),
        "_n",
        F.explode(offs).alias("_o"),
    ).select(
        hex_pack(
            F.col("_f"), res,
            F.col("_q") + F.col("_o.dq"),
            F.col("_r") + F.col("_o.dr"),
        ).alias("hex_id"),
        "_n",
    )
    return spread.groupBy("hex_id").agg(
        F.sum("_n").cast("long").alias("focal_points")
    )


def colocated_pairs(points: DataFrame, level: int = 6,
                    min_shared: int = 2,
                    traj_col: str = "traj_id",
                    cell_col: str = "cell_id",
                    max_per_tile: int | None = None) -> DataFrame:
    """Co-location mining: pairs of trajectories that visit at least
    ``min_shared`` distinct tiles in common — the co-visitation /
    contact-graph primitive.

    Scale shape: (traj, tile) pairs are DISTINCT-ed first (one shuffle,
    collapsing repeat visits), then self-equi-joined on tile_id — the
    join fan-out is sum over tiles of (trajs-per-tile choose 2), which
    the distinct step and the tile level bound; AQE skew-join splits
    hot tiles (plans/salting.py is the explicit backstop).  The pair
    count is a final groupBy with map-side partials.

    ``max_per_tile`` (opt-in) is the hot-tile guard for planet-scale
    runs: tiles hotter than the cap keep only their ``max_per_tile``
    deterministic md5-order trajectories (a fixed uniform subsample of
    the tile's visitors), bounding the worst tile's fan-out at
    cap^2/2 instead of hot^2/2.  The truncation is documented LOSS —
    pairs whose ONLY shared tiles are capped hot tiles may be missed —
    which is the standard trade in co-location mining (a stadium tile
    asserts little about pairwise affinity anyway).  Deterministic, so
    capped results are still reproducible run-to-run.

    Output: (traj_a, traj_b, n_shared_tiles) with traj_a < traj_b.
    """
    from pyspark.sql import Window

    t = (
        with_tile(points, level, cell_col)
        .select(F.col(traj_col).alias("_t"), "tile_id")
        .distinct()
    )
    if max_per_tile is not None:
        w = Window.partitionBy("tile_id").orderBy(
            F.md5(F.col("_t").cast("string")), F.col("_t")
        )
        t = (
            t.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_per_tile)
            .drop("_r")
        )
    a = t.select(F.col("_t").alias("traj_a"), "tile_id")
    b = t.select(F.col("_t").alias("traj_b"), "tile_id")
    return (
        a.join(b, "tile_id")
        .filter(F.col("traj_a") < F.col("traj_b"))
        .groupBy("traj_a", "traj_b")
        .agg(F.count("*").alias("n_shared_tiles"))
        .filter(F.col("n_shared_tiles") >= min_shared)
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def with_geohash(points: DataFrame, precision: int = 6,
                 lat_col: str = "lat", lng_col: str = "lng",
                 out_col: str = "geohash") -> DataFrame:
    """Base-32 geohash assignment — the fourth tiling standard next to
    S2 quad / aperture-7 hex / web-mercator slippy, and the only one
    that is PURE integer bit math end-to-end (no trig, no libm): both
    coordinates quantize by floor division and the bits interleave
    (lng first, MSB first) into 5*precision bits -> base-32 chars.
    Exactly replayable in any engine.

    The fixed-size bit interleave unrolls into a single codegen
    expression; chars come from substring lookups on the literal
    alphabet.
    """
    nbits = 5 * precision
    lat_bits = (nbits) // 2          # lng gets the extra bit when odd
    lng_bits = nbits - lat_bits
    lat_i = F.floor(
        (F.col(lat_col) + 90.0) / 180.0 * float(1 << lat_bits)
    )
    lng_i = F.floor(
        (F.col(lng_col) + 180.0) / 360.0 * float(1 << lng_bits)
    )
    clamp = lambda c, hi: F.least(F.greatest(c, F.lit(0)), F.lit(hi))  # noqa: E731
    lat_i = clamp(lat_i, (1 << lat_bits) - 1).cast("long")
    lng_i = clamp(lng_i, (1 << lng_bits) - 1).cast("long")
    code = F.lit(0).cast("long")
    # interleave MSB-first: even positions (from the top) are lng bits
    for b in range(lng_bits):
        code = code + F.shiftleft(
            F.shiftrightunsigned(lng_i, lng_bits - 1 - b).bitwiseAND(1),
            nbits - 1 - 2 * b,
        )
    for b in range(lat_bits):
        code = code + F.shiftleft(
            F.shiftrightunsigned(lat_i, lat_bits - 1 - b).bitwiseAND(1),
            nbits - 2 - 2 * b,
        )
    d = points.withColumn("_ghc", code)
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            F.shiftrightunsigned(
                F.col("_ghc"), nbits - 5 * (j + 1)
            ).bitwiseAND(31).cast("int") + 1,
            1,
        )
        for j in range(precision)
    ]
    return d.withColumn(out_col, F.concat(*chars)).drop("_ghc")


def geohash_tile_counts(points: DataFrame, precision: int = 6,
                        lat_col: str = "lat",
                        lng_col: str = "lng") -> DataFrame:
    """Counts per geohash cell: one shuffle, map-side partials."""
    return (
        with_geohash(points, precision, lat_col, lng_col)
        .groupBy("geohash")
        .agg(F.count("*").alias("n_points"))
    )


def apply_tile_count_delta(old_counts: DataFrame, removed: DataFrame,
                           added: DataFrame, level: int,
                           cell_col: str = "cell_id") -> DataFrame:
    """Incremental view maintenance for tile counts: given the
    MATERIALIZED counts of the previous snapshot and the delta point
    sets (removed = points leaving, added = points arriving — a moved
    point appears in both, at its old and new position), produce the
    new snapshot's counts without touching the unchanged corpus.

    New work is O(|delta|) + one join keyed by tile_id against the
    (tiny, ~n_tiles-row) counts table: at 10^12 docs with a daily
    churn of 10^8, this replaces a full 10^12-row re-aggregation with
    a 10^8-row one — the checkpointed counts table is the "view" and
    this operator is its maintenance transaction.  Count algebra is
    exact (int64 adds), so the result is bit-identical to a full
    recompute — which is exactly what the contract oracle checks.

    Zero-count tiles are dropped (a full recompute never emits them).
    Output: (tile_id, tile_token, n_points) like ``tile_counts``.
    """
    minus = (
        with_tile(removed, level, cell_col)
        .groupBy("tile_id")
        .agg((-F.count("*")).alias("d"))
    )
    plus = (
        with_tile(added, level, cell_col)
        .groupBy("tile_id")
        .agg(F.count("*").alias("d"))
    )
    delta = (
        minus.unionByName(plus).groupBy("tile_id").agg(F.sum("d").alias("d"))
    )
    return (
        old_counts.select("tile_id", "n_points")
        .join(delta, "tile_id", "full_outer")
        .select(
            "tile_id",
            (
                F.coalesce("n_points", F.lit(0)) + F.coalesce("d", F.lit(0))
            ).alias("n_points"),
        )
        .filter(F.col("n_points") != 0)
        # != 0, NOT > 0: with consistent deltas the two are identical
        # (counts can only drain to exactly zero), but an inconsistent
        # input — a 'removed' point that was never in the old snapshot
        # — yields a NEGATIVE count, and silently dropping it would
        # make a broken delta look like a clean recompute.  Negative
        # rows surface the violation instead.
        .withColumn("tile_token", cell_token("tile_id"))
        .select("tile_id", "tile_token", "n_points")
    )
