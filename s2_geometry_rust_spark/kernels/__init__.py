"""Pure-numpy geometry kernels (no Spark imports).

Every kernel mirrors the observable behavior of the reference library
(/root/reference, Mortoc/s2-geometry-rust) including its documented
deviations from canonical S2 (see SURVEY.md §8).  Kernels are vectorized
over numpy arrays so the Spark layer can call them from Arrow-batched
pandas UDFs with zero per-row Python.
"""
