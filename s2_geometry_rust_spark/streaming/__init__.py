"""Structured Streaming operators: incremental tiling over a document
stream."""

from .tiles import streaming_tile_counts  # noqa: F401
