"""Sources: the interleaved text+media document table (BASELINE.json
input_hint) — deterministic synthesis, span extraction, and the
span-sequence invariant checker."""

from .interleaved import (  # noqa: F401
    DOCUMENTS_SCHEMA,
    interleave_flat_documents,
    synth_documents,
)
from .spans import extract_geo_points, verify_span_sequence  # noqa: F401
