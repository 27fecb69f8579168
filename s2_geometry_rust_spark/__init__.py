"""s2_geometry_rust_spark — a PySpark-native spatial-join & tiling engine.

A brand-new engine (not a port) with the query/data-processing capabilities of
the reference s2-geometry-rust library (/root/reference): S2 cell-id math
(Hilbert-curve encoding), region coverings, point-in-polygon, cell-union set
algebra, kNN via cell-ring expansion, and raster-tile <-> vector joins — all
expressed Spark-first: DataFrames + vectorized pandas/Arrow UDFs, explicit
partitioning / salting / checkpointing for 10^12-document scale.

Layers
------
- ``kernels``   pure-numpy geometry kernels (bit-exact mirrors of the
                reference semantics, incl. its documented simplifications).
- ``functions`` pandas-UDF / Column wrappers around the kernels.
- ``operators`` distributed operators: tiling, spatial join, kNN, dedup,
                ANN similarity search, text analysis.
- ``sources``   synthetic interleaved-document source + span extraction.
- ``plans``     partitioning, skew salting, checkpoint/lineage helpers.
- ``streaming`` incremental/streaming variants.
"""

__version__ = "0.1.0"
