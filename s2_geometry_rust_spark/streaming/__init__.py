"""Structured Streaming operators: incremental tiling over a document
stream."""

from .dedup import (  # noqa: F401
    streaming_corpus_filter,
    streaming_exact_dedup,
    streaming_index_dedup,
    streaming_simhash_dedup,
)
from .sessions import streaming_session_stats  # noqa: F401
from .tiles import (  # noqa: F401
    streaming_hex_tile_counts,
    streaming_tile_counts,
    streaming_tile_pyramid,
    streaming_webmerc_tile_counts,
)
from .spatial import streaming_point_in_region  # noqa: F401
from .stateful import stateful_tile_counts  # noqa: F401
from .geofence import streaming_tile_transitions  # noqa: F401
