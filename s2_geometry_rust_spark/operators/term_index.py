"""S2RegionTermIndexer-style inverted spatial index (engine addition —
the classic S2 pattern for putting spatial containment/intersection
queries on an information-retrieval index; the reference library stops
at coverings, this lifts them to table-scale term joins).

A region is indexed as a set of *terms*: its covering cells (marker
``c``) plus every strict ancestor of each covering cell down to
``min_level`` (marker ``a``).  A query region probes with its covering
cells under BOTH markers plus its covering-cell ancestors under ``c``
only.  Two regions that intersect share a point x; the covering cells
containing x on each side are nested-or-equal, so one side's cell is
the other side's ancestor-or-self — the probe scheme above matches
every such configuration, making the term equi-join a **lossless
candidate superset** of the intersection join (verified end-to-end by
the contract oracle, which brute-forces exact cap intersection).

Scale shape (100 TB): terms are (marker, cell_id) BINARY key pairs —
never materialized strings — so the candidate stage is one hash
equi-join on a long key with uniformly distributed cell ids; index
terms are O(max_cells * levels) per region; the exact refine is pure
whole-stage-codegen chord algebra (chord_angle.rs Add) on broadcast
cap parameters.  This is the join strategy that beats covering
range-joins when the index side is write-once/read-many: the term
table bucket-sorts by cell_id once and every query after that is an
index lookup, not a geometry pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.columns import cell_level, cell_parent
from .coverings import cover_regions

# term markers
_COVER = 0   # 'c': a covering cell of the region
_ANCESTOR = 1  # 'a': a strict ancestor of a covering cell


def _ancestor_cells(cell_col: str, min_level: int, max_level: int):
    """Array column of strict ancestors of ``cell_col`` at levels
    [min_level, level(cell)) — null-filtered."""
    lvl = cell_level(cell_col)
    return F.filter(
        F.array(*[
            F.when(lvl > L, cell_parent(cell_col, L))
            for L in range(min_level, max_level)
        ]),
        lambda c: c.isNotNull(),
    )


def region_term_index(regions: DataFrame, max_cells: int = 16,
                      min_level: int = 0,
                      max_level: int = 12) -> DataFrame:
    """regions (fixtures.REGIONS_SCHEMA) -> (region_id, marker, cell_id)
    inverted-index terms.  Coverings are the conservative (join-sound)
    variant — REQUIRED: reference-parity coverings may miss boundary
    slivers, which would break the lossless-superset guarantee."""
    cov = cover_regions(
        regions, max_cells=max_cells, min_level=min_level,
        max_level=max_level, conservative=True,
    )
    cover_terms = cov.select(
        "region_id", F.lit(_COVER).alias("marker"), F.col("cell_id")
    )
    anc_terms = cov.select(
        "region_id",
        F.explode(_ancestor_cells("cell_id", min_level, max_level)).alias(
            "cell_id"
        ),
    ).select("region_id", F.lit(_ANCESTOR).alias("marker"), "cell_id")
    return cover_terms.unionByName(anc_terms).distinct()


def region_query_terms(regions: DataFrame, max_cells: int = 16,
                       min_level: int = 0, max_level: int = 12,
                       id_col: str = "query_id") -> DataFrame:
    """Query-side probe terms: covering cells under both markers,
    covering-cell ancestors under the cover marker only."""
    cov = cover_regions(
        regions, max_cells=max_cells, min_level=min_level,
        max_level=max_level, conservative=True,
    ).withColumnRenamed("region_id", id_col)
    both = cov.select(
        id_col,
        F.explode(F.array(F.lit(_COVER), F.lit(_ANCESTOR))).alias("marker"),
        "cell_id",
    )
    anc = cov.select(
        id_col,
        F.explode(_ancestor_cells("cell_id", min_level, max_level)).alias(
            "cell_id"
        ),
    ).select(id_col, F.lit(_COVER).alias("marker"), "cell_id")
    return both.unionByName(anc).distinct()


def term_intersect_candidates(query_regions: DataFrame,
                              index_regions: DataFrame,
                              max_cells: int = 16, min_level: int = 0,
                              max_level: int = 12) -> DataFrame:
    """Candidate (query_id, region_id) pairs whose regions MAY
    intersect: one hash equi-join on (marker, cell_id)."""
    idx = region_term_index(
        index_regions, max_cells=max_cells,
        min_level=min_level, max_level=max_level,
    )
    q = region_query_terms(
        query_regions, max_cells=max_cells,
        min_level=min_level, max_level=max_level,
    )
    return q.join(idx, ["marker", "cell_id"]).select(
        "query_id", "region_id"
    ).distinct()


def _chord_add_ge(ra2, rb2, d2):
    """chord_angle.rs Add >= d2 as a codegen column expression —
    EXACTLY the kernel formula (kernels/chord.py:add), so the DuckDB
    oracle replays it bit-for-bit on the same literal cap params:
    x = a2*(1-b2/4); y = b2*(1-a2/4); add = min(x+y+2*sqrt(max(x*y,0)), 4)
    with the b2==0 and a2+b2>=4 pins."""
    x = ra2 * (F.lit(1.0) - F.lit(0.25) * rb2)
    y = rb2 * (F.lit(1.0) - F.lit(0.25) * ra2)
    added = F.least(
        x + y + F.lit(2.0) * F.sqrt(F.greatest(x * y, F.lit(0.0))),
        F.lit(4.0),
    )
    added = F.when(rb2 == 0.0, ra2).otherwise(added)
    added = F.when(ra2 + rb2 >= 4.0, F.lit(4.0)).otherwise(added)
    return added >= d2


def cap_intersect_join_terms(query_caps: DataFrame, index_caps: DataFrame,
                             max_cells: int = 16, min_level: int = 0,
                             max_level: int = 12) -> DataFrame:
    """Exact cap-intersection join via the term index: candidates from
    the (marker, cell) equi-join, refined with the reference's
    chord-space predicate (cap.rs intersects: add(rA2, rB2) >= d2(cA,
    cB)) entirely in whole-stage codegen.

    Both inputs are fixtures.REGIONS_SCHEMA cap rows (p0=lat, p1=lng,
    p2=radius_deg); cap chord parameters are derived with the exact
    kernel constructor (S2Cap.from_center_degrees) inside the same
    batched covering pass that cover_regions already runs, here
    recomputed as literal-free JVM columns via the cap param frames.
    """
    from ..kernels import latlng as lk
    from ..kernels.caps import S2Cap
    import numpy as np

    def cap_params(df: DataFrame, id_out: str) -> DataFrame:
        # small dimension tables by contract (caps fixture sets);
        # derive exact chord params row-by-row with the kernel
        # constructor so refine semantics == kernels/caps.py intersects
        rows = df.select("region_id", "p0", "p1", "p2").collect()
        out = []
        for r in rows:
            lat = lk.degrees_to_radians(np.float64(r["p0"]))
            lng = lk.degrees_to_radians(np.float64(r["p1"]))
            x, y, z = lk.latlng_to_xyz(np.float64(lat), np.float64(lng))
            cap = S2Cap.from_center_degrees(
                (float(x), float(y), float(z)), float(r["p2"])
            )
            out.append((r["region_id"], cap.cx, cap.cy, cap.cz,
                        float(cap.radius_l2)))
        return df.sparkSession.createDataFrame(
            out, f"{id_out} string, cx double, cy double, cz double, r2 double"
        )

    cands = term_intersect_candidates(
        query_caps, index_caps, max_cells=max_cells,
        min_level=min_level, max_level=max_level,
    )
    qp = cap_params(query_caps, "query_id").select(
        "query_id", F.col("cx").alias("qx"), F.col("cy").alias("qy"),
        F.col("cz").alias("qz"), F.col("r2").alias("qr2"),
    )
    ip = cap_params(index_caps, "region_id").select(
        "region_id", F.col("cx").alias("ix"), F.col("cy").alias("iy"),
        F.col("cz").alias("iz"), F.col("r2").alias("ir2"),
    )
    j = cands.join(F.broadcast(qp), "query_id").join(
        F.broadcast(ip), "region_id"
    )
    d2 = F.least(
        (F.col("qx") - F.col("ix")) * (F.col("qx") - F.col("ix"))
        + (F.col("qy") - F.col("iy")) * (F.col("qy") - F.col("iy"))
        + (F.col("qz") - F.col("iz")) * (F.col("qz") - F.col("iz")),
        F.lit(4.0),
    )
    keep = _chord_add_ge(F.col("qr2"), F.col("ir2"), d2)
    # empty caps (r2 < 0) never intersect anything (cap.rs:265-270)
    keep = keep & (F.col("qr2") >= 0.0) & (F.col("ir2") >= 0.0)
    return j.filter(keep).select("query_id", "region_id")
