"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults: Arrow-batched UDF transfer, AQE
with skew-join handling, and a shuffle-partition count appropriate for
the local test harness (the real cluster overrides via spark-submit
conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _ensure_package_on_executor_path() -> None:
    """Local-mode executor Python workers inherit os.environ, not the
    driver's sys.path — put the package's parent dir on PYTHONPATH so
    UDFs can unpickle.  (On a real cluster, ship the package with
    ``spark-submit --py-files s2_geometry_rust_spark.zip`` instead.)"""
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )


def get_spark(app: str = "s2spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    _ensure_package_on_executor_path()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
