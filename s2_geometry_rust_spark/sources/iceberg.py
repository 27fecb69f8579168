"""Iceberg catalog wiring for the engine's tables (north_rule: the
interleaved-document corpus and the checkpoint/lineage table live in
Iceberg on a real cluster).

This sandbox ships no Iceberg runtime jars (re-checked each round; as
of round 5, 2026-08-21, a filesystem-wide search finds no
iceberg-spark-runtime jar and no network access to fetch one), so
every entry point here is dual-path:

* **Iceberg path** — used automatically when
  ``org.apache.iceberg.spark.SparkCatalog`` is loadable: tables are
  addressed as ``<catalog>.<db>.<name>`` through a Hadoop-type catalog
  rooted at the warehouse directory, written with the V2
  ``df.writeTo(...)`` API (append/createOrReplace) so commits are
  atomic snapshots and readers get time-travel + metadata pruning for
  free.
* **Parquet fallback** — byte-compatible layout at
  ``<warehouse>/<db>/<name>`` with identical append semantics; the
  schema and protocol (append-only checkpoint rows, anti-join resume)
  are exactly what the Iceberg table would hold, so flipping a cluster
  to the real catalog is a config change, not a code change.

To enable Iceberg on a real deployment, submit with::

    spark-submit --py-files s2_geometry_rust_spark.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      $(python -c "from s2_geometry_rust_spark.sources.iceberg import \
                   iceberg_submit_flags; print(iceberg_submit_flags('/wh'))")

No reference counterpart (the reference is a single-node geometry
library); this layer exists for the engine's 10^12-doc target.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CATALOG = "s2local"
DEFAULT_DB = "db"


def iceberg_configs(warehouse: str, catalog: str = DEFAULT_CATALOG) -> dict:
    """Builder/config pairs that register a Hadoop-type Iceberg catalog.

    Pure function (no Spark) so tests can assert the wiring without the
    runtime jars; pass the dict into ``SparkSession.builder.config``
    pairs or ``--conf`` flags verbatim."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_submit_flags(warehouse: str, catalog: str = DEFAULT_CATALOG) -> str:
    """The same wiring rendered as ``--conf`` flags for spark-submit."""
    return " ".join(
        f"--conf {k}={v}" for k, v in iceberg_configs(warehouse, catalog).items()
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _qualified(name: str, catalog: str, db: str) -> str:
    return f"{catalog}.{db}.{name}"


def _fallback_path(warehouse: str, name: str, db: str) -> str:
    return os.path.join(warehouse, db, name)


def write_table(df: DataFrame, name: str, warehouse: str, *,
                mode: str = "append", catalog: str = DEFAULT_CATALOG,
                db: str = DEFAULT_DB) -> None:
    """Write ``df`` to the catalog table ``<catalog>.<db>.<name>``.

    mode: ``append`` (atomic snapshot append) or ``replace``
    (createOrReplace).  Falls back to the parquet layout when the
    Iceberg runtime is absent."""
    if mode not in ("append", "replace"):
        raise ValueError(f"unsupported mode: {mode}")
    spark = df.sparkSession
    if iceberg_available(spark):
        for k, v in iceberg_configs(warehouse, catalog).items():
            spark.conf.set(k, v)
        writer = df.writeTo(_qualified(name, catalog, db))
        if mode == "append":
            # first append must create the table
            try:
                writer.append()
            except Exception:
                writer.create()
        else:
            writer.createOrReplace()
    else:
        df.write.mode("append" if mode == "append" else "overwrite").parquet(
            _fallback_path(warehouse, name, db)
        )


def read_table(spark: SparkSession, name: str, warehouse: str, *,
               catalog: str = DEFAULT_CATALOG, db: str = DEFAULT_DB,
               snapshot_id: int | None = None) -> DataFrame:
    """Read a catalog table; ``snapshot_id`` time-travels on Iceberg
    (ignored on the parquet fallback, which keeps only the live state)."""
    if iceberg_available(spark):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(_qualified(name, catalog, db))
    return spark.read.parquet(_fallback_path(warehouse, name, db))


def table_exists(spark: SparkSession, name: str, warehouse: str, *,
                 catalog: str = DEFAULT_CATALOG, db: str = DEFAULT_DB) -> bool:
    if iceberg_available(spark):
        return spark.catalog.tableExists(_qualified(name, catalog, db))
    try:
        spark.read.parquet(_fallback_path(warehouse, name, db)).schema
        return True
    except Exception:
        return False
