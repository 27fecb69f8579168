"""Cell-union set algebra as DataFrame operators.

Two execution tiers:

- ``*_grouped``: per-union-id grouped kernels via ``applyInPandas`` —
  bit-exact replicas of the reference algorithms (cell_union.rs:600-678)
  for parity testing and for workloads with many small unions
  (embarrassingly parallel across union ids, one shuffle to group).

- ``normalize_distributed``: the scale path for one huge union spread
  across partitions (e.g. the covering of a continent at level 20+):
  iterative DataFrame fixpoint — drop contained cells with a running-max
  window over the Hilbert order, collapse complete sibling quadruples
  via groupBy(parent), repeat until stable.  Each pass is one window +
  one groupBy (both on range-partitioned unsigned keys); worst case 30
  passes, typical <= 3.  The fixpoint's normal form is unique, so it
  equals the reference's sequential result (cell_union.rs:600-629).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions import cell_level, cell_range_max, cell_range_min, unsigned_sort_key
from ..functions.columns import LONG_MIN
from ..kernels import unions as ku

UNION_CELLS_SCHEMA = StructType(
    [
        StructField("union_id", StringType()),
        StructField("cell_id", LongType()),
    ]
)


def _grouped(kernel) -> object:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf["union_id"].iloc[0]
        ids = pdf["cell_id"].to_numpy(np.int64).view(np.uint64)
        out = kernel(ids)
        return pd.DataFrame(
            {"union_id": uid, "cell_id": np.asarray(out, np.uint64).view(np.int64)}
        )

    return fn


def normalize_grouped(cells: DataFrame) -> DataFrame:
    """Per-union normalize (cell_union.rs:600-629 exact semantics)."""
    return cells.groupBy("union_id").applyInPandas(
        _grouped(ku.normalize), UNION_CELLS_SCHEMA
    )


def _pairwise(cells_a: DataFrame, cells_b: DataFrame, kernel) -> DataFrame:
    """Join two exploded union tables on union_id and apply a pairwise
    kernel per group."""
    a = cells_a.withColumn("_side", F.lit(0))
    b = cells_b.withColumn("_side", F.lit(1))
    both = a.unionByName(b)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf["union_id"].iloc[0]
        ga = pdf[pdf._side == 0]["cell_id"].to_numpy(np.int64).view(np.uint64)
        gb = pdf[pdf._side == 1]["cell_id"].to_numpy(np.int64).view(np.uint64)
        out = kernel(ga, gb)
        return pd.DataFrame(
            {"union_id": uid, "cell_id": np.asarray(out, np.uint64).view(np.int64)}
        )

    return both.groupBy("union_id").applyInPandas(fn, UNION_CELLS_SCHEMA)


def union_grouped(a: DataFrame, b: DataFrame) -> DataFrame:
    """concat + normalize (cell_union.rs:375-380)."""
    return _pairwise(a, b, ku.union)


def intersection_grouped(a: DataFrame, b: DataFrame) -> DataFrame:
    """two-pointer sorted merge (cell_union.rs:632-666)."""
    return _pairwise(a, b, ku.intersection)


def difference_grouped(a: DataFrame, b: DataFrame) -> DataFrame:
    """recursive child subdivision (cell_union.rs:669-678)."""
    return _pairwise(a, b, ku.difference)


def expand_grouped(cells: DataFrame, expand_level: int) -> DataFrame:
    """Union expand (cell_union.rs:427-444): promote to expand_level and
    add the reference's placeholder id-space neighbors (SURVEY.md §8.3),
    then normalize — per-union kernel for exact parity."""
    return cells.groupBy("union_id").applyInPandas(
        _grouped(lambda ids: ku.expand(ids, expand_level)), UNION_CELLS_SCHEMA
    )


def expand_with_radius_grouped(cells: DataFrame, min_radius_radians: float,
                               max_level_diff: int) -> DataFrame:
    """Radius-constrained union expand (cell_union.rs:446-467): the
    expand level is min(min_level + max_level_diff, level_for_min_width
    (min_radius)) — per-union, so the kernel runs per group (the level
    depends on the group's largest cell)."""
    return cells.groupBy("union_id").applyInPandas(
        _grouped(
            lambda ids: ku.expand_with_radius(
                ids, min_radius_radians, max_level_diff
            )
        ),
        UNION_CELLS_SCHEMA,
    )


def contains_flags(unions_df: DataFrame, probe_cells: DataFrame) -> DataFrame:
    """For each (union_id, probe cell): does the union contain it?
    Binary-search semantics of cell_union.rs:262-282 re-expressed as an
    ancestor-range predicate: contained iff some union cell's range
    covers the probe's whole range.  Pure joins — no UDF."""
    u = unions_df.select(
        "union_id",
        unsigned_sort_key(cell_range_min("cell_id")).alias("_umin"),
        unsigned_sort_key(cell_range_max("cell_id")).alias("_umax"),
    )
    p = probe_cells.select(
        "union_id",
        F.col("cell_id").alias("probe_cell"),
        unsigned_sort_key(cell_range_min("probe_cell")).alias("_pmin"),
        unsigned_sort_key(cell_range_max("probe_cell")).alias("_pmax"),
    )
    hit = p.join(
        u,
        (p["union_id"] == u["union_id"])
        & (u["_umin"] <= p["_pmin"])
        & (p["_pmax"] <= u["_umax"]),
        "left_semi",
    )
    return hit.select("union_id", "probe_cell").withColumn(
        "contained", F.lit(True)
    )


def normalize_distributed(cells: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Scale-path normalize for huge exploded unions.

    Round = (1) drop cells contained in a predecessor via a running-max
    of range_max over Hilbert order (laminar intervals make this exact);
    (2) collapse groups of exactly 4 distinct sibling cells into their
    parent.  Iterate until the row count stops changing.
    """
    cur = cells.dropDuplicates(["union_id", "cell_id"])
    prev_n = -1
    for _ in range(max_rounds):
        # Truncate lineage each round: the fixpoint otherwise stacks ~10
        # window+join+union layers per iteration and the plan (and its
        # re-execution cost under any recompute) grows without bound.
        # localCheckpoint materializes the round's result and the
        # count() below doubles as its action.
        cur = cur.localCheckpoint(eager=False)
        n = cur.count()
        if n == prev_n:
            break
        prev_n = n
        # Sort by (range_min asc, range_max desc): in a laminar family a
        # containing cell then always precedes its contained cells (the
        # raw id order does NOT have this property — a parent's id is the
        # center of its range, after its first-half children).
        w = (
            Window.partitionBy("union_id")
            .orderBy(
                unsigned_sort_key(cell_range_min("cell_id")),
                F.desc(unsigned_sort_key(cell_range_max("cell_id"))),
            )
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cur = (
            cur.withColumn(
                "_prevmax", F.max(unsigned_sort_key(cell_range_max("cell_id"))).over(w)
            )
            .filter(
                F.col("_prevmax").isNull()
                | (F.col("_prevmax") < unsigned_sort_key(cell_range_max("cell_id")))
            )
            .drop("_prevmax")
        )
        lvl = cell_level("cell_id")
        parent1 = (
            F.col("cell_id").bitwiseAND(-(F.col("_plsb") * 4)).bitwiseOR(F.col("_plsb") * 4)
        )
        cur = cur.withColumn("_plsb", F.col("cell_id").bitwiseAND(-F.col("cell_id")))
        cur = cur.withColumn(
            "_parent", F.when(lvl > 0, parent1).otherwise(F.lit(None))
        )
        sib = (
            cur.groupBy("union_id", "_parent")
            .agg(F.count("*").alias("_nsib"))
            .filter(F.col("_parent").isNotNull() & (F.col("_nsib") == 4))
            .select("union_id", F.col("_parent").alias("_full_parent"))
        )
        collapsed = (
            cur.join(
                sib,
                (cur["union_id"] == sib["union_id"])
                & (cur["_parent"] == sib["_full_parent"]),
                "left_semi",
            )
            .select("union_id", F.col("_parent").alias("cell_id"))
            .dropDuplicates(["union_id", "cell_id"])
        )
        kept = cur.join(
            sib,
            (cur["union_id"] == sib["union_id"])
            & (cur["_parent"] == sib["_full_parent"]),
            "left_anti",
        ).select("union_id", "cell_id")
        cur = kept.unionByName(collapsed)
    return cur


def _expand_candidates(df: DataFrame) -> DataFrame:
    """(union_id, cell_id, _el) -> exploded expand candidates: the
    promoted cell plus the reference's +/- id-space step "neighbors"
    (cell_union.rs:427-444 + cell_id.rs:696-722), pure whole-stage
    codegen.

    ANSI-safe u64 arithmetic: the +/- step runs in the usk domain
    (id XOR 2^63), where every VALID cell's key lies in [-2^63, 2^62)
    and one step (<= 2^61) can never overflow int64 — no try_add
    (whose null-on-wrap is the wrong semantics: a face-3-top + step
    legitimately wraps into face 4's negative-int64 id range).  The
    neighbor validity test (is_valid AND level == el) reduces to
    "low bits below the step equal the level lsb" + "face < 6",
    avoiding `-cand` negations that would ANSI-overflow on the
    u64 = 2^63 candidate."""
    d = (
        df
        .withColumn("_lvl_lsb", F.expr("shiftleft(1L, (30 - _el) * 2)"))
        .withColumn("_step", F.expr("shiftleft(1L, (30 - _el) * 2 + 1)"))
        .withColumn(
            "_prom",
            F.expr(
                "CASE WHEN (cell_id & -cell_id) < _lvl_lsb"
                " THEN (cell_id & -_lvl_lsb) | _lvl_lsb"
                " ELSE cell_id END"
            ),
        )
        .withColumn("_usk", unsigned_sort_key(F.col("_prom")))
    )
    usk_step = unsigned_sort_key(F.col("_step"))
    prev_id = F.when(
        F.col("_usk") >= usk_step,
        (F.col("_usk") - F.col("_step")).bitwiseXOR(F.lit(LONG_MIN)),
    )
    next_id = (F.col("_usk") + F.col("_step")).bitwiseXOR(F.lit(LONG_MIN))
    d = d.select(
        "union_id",
        "_lvl_lsb",
        "_step",
        F.posexplode(F.array(F.col("_prom"), prev_id, next_id)).alias(
            "_pos", "cell_id"
        ),
    )
    neighbor_ok = (
        (F.col("cell_id").bitwiseAND(F.col("_step") - 1) == F.col("_lvl_lsb"))
        & (F.expr("shiftrightunsigned(cell_id, 61)") < 6)
    )
    return d.filter(
        F.col("cell_id").isNotNull() & ((F.col("_pos") == 0) | neighbor_ok)
    ).select("union_id", "cell_id")


def expand_distributed(cells: DataFrame, expand_level: int) -> DataFrame:
    """Scale-path expand: codegen candidates + the distributed
    normalize fixpoint — no whole-union-in-one-task requirement, unlike
    expand_grouped.  Same unique normal form, so identical output
    (parity-tested in test_knn_unions)."""
    return normalize_distributed(
        _expand_candidates(
            cells.withColumn("_el", F.lit(int(expand_level)))
        )
    )


def expand_with_radius_distributed(cells: DataFrame,
                                   min_radius_radians: float,
                                   max_level_diff: int) -> DataFrame:
    """Scale-path expand_with_radius (cell_union.rs:446-467): the
    per-union minimum level comes from one small groupBy; the expand
    level least(min_level + diff, radius_level) rides each row as a
    column.  Mirrors the kernel's quirks: min_level is computed BEFORE
    the wide-radius pre-expand, and a radius wider than a face cell
    takes the reference's expand(0)-then-expand(0) double round.
    Contract (same as the grouped twin's callers): the input union is
    already NORMALIZED — min_level is only meaningful after sibling
    collapse."""
    from ..kernels import cellid as ci

    radius_level = ci.level_for_min_width(min_radius_radians)
    if radius_level == 0:
        # el = min(min_level + diff, 0) = 0 for every union
        out = cells
        if min_radius_radians > ci.min_width_at_level(0):
            out = expand_distributed(out, 0)
        return expand_distributed(out, 0)
    params = cells.groupBy("union_id").agg(
        F.least(
            F.min(cell_level("cell_id")) + max_level_diff,
            F.lit(radius_level),
        ).alias("_el")
    )
    return normalize_distributed(
        _expand_candidates(cells.join(F.broadcast(params), "union_id"))
    )


def canonicalize_covering_distributed(cells: DataFrame, min_level: int,
                                      max_level: int, level_mod: int = 1,
                                      max_cells: int = 8) -> DataFrame:
    """CanonicalizeCovering lifted to (union_id, cell_id) tables
    (region_coverer.rs:542-596; kernel twin
    kernels/coverer.py:canonicalize_covering):

    1. per-cell level clamp: levels outside [min_level, max_level] snap
       to the nearer bound; in-range levels round to a multiple of
       level_mod (down when rem < mod/2, else up unless that exceeds
       max_level) — the reference applies its (id & -lsb) | lsb parent
       formula UNCONDITIONALLY at the target level, so an upward snap
       produces the interior descendant that formula yields, and the
       engine mirrors it bit-for-bit (pure codegen bit math);
    2. normalize (sort / drop-contained / sibling-collapse) — the
       existing distributed fixpoint;
    3. truncation to max_cells: the reference stable-sorts the
       normalized (id-sorted) array by level and keeps the first
       max_cells, i.e. rank by (level, unsigned id) <= max_cells; a
       prefix of a normalized set is still normalized (no contained
       pair or complete sibling quad can appear by *removing* cells),
       so its re-normalize is a sort — one window, no second fixpoint.

    All three phases are single-exchange window/agg shapes on
    (union_id)-hash partitioning; nothing leaves the JVM.
    """
    lv = cell_level("cell_id")
    rem = lv % level_mod
    in_range_target = (
        F.when(rem == 0, lv)
        .when(rem < F.lit(level_mod // 2), lv - rem)
        .otherwise(
            F.when(lv + (level_mod - rem) <= max_level,
                   lv + (level_mod - rem)).otherwise(lv - rem)
        )
    )
    target = (
        F.when(lv < min_level, F.lit(min_level))
        .when(lv > max_level, F.lit(max_level))
        .otherwise(in_range_target)
    )
    new_lsb = F.expr("shiftleft(1L, (30 - _target) * 2)")
    clamped = (
        cells.withColumn("_target", target)
        .withColumn(
            "cell_id",
            F.when(F.col("_target") == lv, F.col("cell_id")).otherwise(
                F.col("cell_id").bitwiseAND(-new_lsb).bitwiseOR(new_lsb)
            ),
        )
        .select("union_id", "cell_id")
        .dropDuplicates(["union_id", "cell_id"])
    )
    norm = normalize_distributed(clamped)
    w = Window.partitionBy("union_id").orderBy(
        cell_level("cell_id"), unsigned_sort_key("cell_id")
    )
    return (
        norm.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_cells)
        .select("union_id", "cell_id")
    )
