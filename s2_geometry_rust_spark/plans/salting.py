"""Deterministic skew salting for hot-tile joins (north_rule).

Geospatial key distributions are Zipfian (cities vs ocean): a join or
aggregation keyed by tile_id can put 1% of tiles on 50% of rows.  AQE
skew-join splitting is the backstop; this module gives the explicit,
deterministic variant that also works for aggregations and survives
AQE-disabled clusters:

- ``hot_keys``: one cheap sampled pass over the fact side to find keys
  whose row share exceeds a threshold (collected driver-side — the hot
  set is tiny by definition).
- ``salted_join``: fact rows of hot keys get salt = pmod(hash(row key
  columns...), n_salts) — a *deterministic* function of the row, never
  rand(), so retries/resumes produce identical partitioning (required
  for checkpoint resumability).  The dim side replicates hot keys
  n_salts times via a posexplode.  Join output is provably identical to
  the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(fact: DataFrame, key: str, threshold: float = 0.01,
             sample_fraction: float = 0.05, max_keys: int = 1000) -> list:
    """Keys holding more than ``threshold`` share of (sampled) rows."""
    s = fact.select(key)
    if sample_fraction < 1.0:
        s = s.sample(fraction=sample_fraction, seed=42)
    total = s.count()
    if total == 0:
        return []
    rows = (
        s.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= threshold * total)
        .orderBy(F.desc("_n"))
        .limit(max_keys)
        .collect()
    )
    return [r[0] for r in rows]


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, hot: list | None = None,
                salt_on: str | None = None, how: str = "inner") -> DataFrame:
    """Equi-join fact x dim on ``key`` with hot keys salted ``n_salts``
    ways.  ``salt_on``: a fact column whose hash spreads the hot rows
    (defaults to the whole-row xxhash64 of the key column plus a
    monotonically-stable column if provided)."""
    if hot is None:
        hot = hot_keys(fact, key)
    if not hot:
        return fact.join(dim, key, how)

    hot_arr = F.array(*[F.lit(k) for k in hot])
    is_hot = F.array_contains(hot_arr, F.col(key))
    salt_src = F.col(salt_on) if salt_on else F.xxhash64(*fact.columns)
    f = fact.withColumn(
        "_salt", F.when(is_hot, F.pmod(salt_src, F.lit(n_salts))).otherwise(F.lit(0))
    )
    d = dim.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.array_contains(hot_arr, F.col(key)),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def salted_counts(df: DataFrame, key: str, n_salts: int = 16,
                  salt_on: str | None = None,
                  count_col: str = "n") -> DataFrame:
    """Two-stage skew-proof count aggregation: groupBy(key, salt) ->
    groupBy(key).

    Spark's partial (map-side) aggregation already bounds per-task
    state, but a single pathological reducer key still lands on one
    task in the final exchange.  Salting splits each key across
    ``n_salts`` reducers and recombines with a second (tiny) shuffle
    keyed by the now-aggregated key.  Salt is a deterministic function
    of the row (never rand()) so retries/resume repartition
    identically; the result is provably identical to the unsalted
    groupBy-count for any salt assignment."""
    salt_src = (F.xxhash64(salt_on) if salt_on
                else F.xxhash64(*df.columns))
    return (
        df.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias(count_col))
    )
