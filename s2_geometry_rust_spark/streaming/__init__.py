"""Structured Streaming operators: incremental tiling over a document
stream."""

from .stateful import stateful_tile_counts  # noqa: F401
from .tiles import streaming_tile_counts  # noqa: F401
