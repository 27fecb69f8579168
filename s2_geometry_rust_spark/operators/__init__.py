"""Distributed operators: tiling, coverings, spatial joins, kNN,
cell-union set algebra, dedup, similarity search, and text analysis."""
