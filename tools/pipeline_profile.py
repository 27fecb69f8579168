"""Stage-by-stage wall-time breakdown of the headline spatial pipeline
(synth -> extract -> encode -> point-in-region join) at a given doc
count, each stage cumulative in its own fresh action.  Usage:

    python tools/pipeline_profile.py [n_docs] [cpus]

Run on an idle box; numbers are min-of-2 per stage (steady state).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from s2_geometry_rust_spark import fixtures
    from s2_geometry_rust_spark.operators.spatial_join import (
        point_in_region_join,
    )
    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.sources import (
        extract_geo_points,
        synth_documents,
    )

    spark = get_spark("profile", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("OFF")

    docs = synth_documents(spark, n_docs, seed=42, partitions=cpus * 2)
    pts = extract_geo_points(docs)
    regions = fixtures.cap_regions(spark).unionByName(
        fixtures.loop_regions(spark, ["arctic_80", "candy_cane", "small_ne_cw"])
    )
    joined = point_in_region_join(pts, regions, max_cells=64,
                                  distributed=False)

    # geo-span explode WITHOUT the encode UDF: isolates the Arrow
    # encode cost from the relational extract cost
    idx = F.transform("spans", lambda s, i: F.struct(i.alias("i"),
                                                     s.alias("s")))
    geo = F.filter(idx, lambda e: e["s"]["kind"] == "geo")
    extract_only = docs.select(
        "doc_id", F.explode(geo).alias("e")
    ).select(
        "doc_id",
        F.col("e.i").alias("span_idx"),
        F.regexp_extract(F.col("e.s.text"), r"^POINT\(([-+0-9.eE]+) "
                         r"([-+0-9.eE]+)\)$", 1).cast("double").alias("lat"),
        F.regexp_extract(F.col("e.s.text"), r"^POINT\(([-+0-9.eE]+) "
                         r"([-+0-9.eE]+)\)$", 2).cast("double").alias("lng"),
    ).filter(F.col("lat").isNotNull() & F.col("lng").isNotNull())

    stages = [
        ("synth_only", docs),
        ("synth+extract_noudf", extract_only),
        ("synth+extract+encode", pts),
        ("full_pipeline_join", joined),
    ]
    for name, df in stages:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.count()
            best = min(best, time.time() - t0)
        print(f"{name:26s} {best:7.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
