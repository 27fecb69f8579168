"""Span extraction and the span-sequence invariant.

``extract_geo_points`` is pure JVM relational algebra (posexplode +
regexp + cast) up to the single Arrow UDF that Hilbert-encodes the
coordinates — Catalyst prunes/pushes everything around it, and the
output carries (doc_id, span_idx) so results can always be re-joined to
the untouched document row.

The per-row invariant (BASELINE.json input_hint): every engine output
must preserve span-sequence equality (kind, text, media_ref, order) vs
the input.  ``verify_span_sequence`` checks it distributively: an
anti-join on the exploded (doc_id, span_idx, kind, text, media_ref)
tuples — zero rows back means the sequences are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import cell_id_from_latlng_deg

_POINT_RE = r"^POINT\(([-+0-9.eE]+) ([-+0-9.eE]+)\)$"


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, kind, text, media_ref, offset) rows, span order
    preserved in span_idx."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_geo_points(docs: DataFrame) -> DataFrame:
    """Geo spans -> (doc_id, span_idx, lat, lng, cell_id:long leaf).

    String->double parse is correctly rounded (IEEE 754), so the lat/lng
    written by the generator round-trips exactly; the leaf id then
    matches kernels.cellid.from_point bit-for-bit.
    """
    # Filter the spans ARRAY to geo entries before exploding (index
    # attached first so span_idx stays the ORIGINAL position): with
    # ~4.5 spans/doc and one geo span, the generator explodes 4.5x
    # fewer rows than explode-then-filter — measured ~8% off the whole
    # extract stage at 4M docs, output bit-identical.
    idx = F.transform("spans", lambda s, i: F.struct(i.alias("i"), s.alias("s")))
    geo = F.filter(idx, lambda e: e["s"]["kind"] == "geo")
    # Validate with ONE regex pass (rlike — same pattern, so the exact
    # same acceptance set as the old double regexp_extract), then parse
    # with substring+split: the group charset excludes spaces/parens, so
    # an accepted string's interior has exactly one space and the two
    # split halves are byte-identical to the regex groups.  Measured
    # 1.44x faster over the whole extract+encode stage at 4M docs
    # (3.45 s -> 2.39 s, local[32]), output hash-identical.
    s = docs.select("doc_id", F.explode(geo).alias("e")).select(
        "doc_id",
        F.col("e.i").alias("span_idx"),
        F.col("e.s.text").alias("_t"),
    ).filter(F.col("_t").rlike(_POINT_RE))
    parts = F.split(F.expr("substring(_t, 7, length(_t)-7)"), " ")
    s = s.select(
        "doc_id",
        "span_idx",
        parts.getItem(0).cast("double").alias("lat"),
        parts.getItem(1).cast("double").alias("lng"),
    )
    return s.withColumn("cell_id", cell_id_from_latlng_deg("lat", "lng"))


def verify_span_sequence(input_docs: DataFrame, output_docs: DataFrame) -> int:
    """Count of docs whose span sequence (kind, text, media_ref, order)
    differs between input and output.  0 == invariant holds."""
    key = ["doc_id", "span_idx", "kind", "text", "media_ref"]
    a = explode_spans(input_docs).select(key)
    b = explode_spans(output_docs).select(key)
    broken = a.exceptAll(b).unionAll(b.exceptAll(a))
    return broken.select("doc_id").distinct().count()
