"""Table profiling for pipeline data-quality gates (engine addition):
per-column row/null/distinct counts and min/max in ONE pass over the
input — the summary a 100-TB ingest job runs before committing a
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nonnull,
    n_distinct, min_val, max_val) — min/max rendered as strings (only
    use on integer/string columns; float formatting is engine-specific
    and belongs in a nano-scaled query instead).

    Scale shape: a single aggregate pass — Spark plans the multiple
    COUNT(DISTINCT ...) via one Expand (the grouping-sets machinery),
    so the input is still scanned once; the row->column unpivot is a
    driver-free explode of a literal struct array over the one-row
    aggregate.
    """
    aggs = [F.count("*").alias("_n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.count_distinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    packed = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_val"),
            F.col(f"_mx_{c}").alias("max_val"),
        )
        for c in columns
    ])
    return row.select(F.explode(packed).alias("p")).select("p.*")
