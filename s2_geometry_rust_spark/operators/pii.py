"""PII detection and redaction for training-data pipelines.

The standard pre-training hygiene pass (emails, phone numbers,
SSN-like ids, IPv4 addresses): count occurrences per document and
rewrite the text with type-tagged placeholders.  Engine-pioneered
pipeline operator (no reference counterpart — the reference is a
geometry library); first-class here because a 100-TB corpus build
runs exactly this scan between quality gating and dedup.

Scale shape: ONE pass over the text column, zero shuffles, zero
Python — every pattern is a Java-regex `regexp_extract_all` /
`regexp_replace` inside whole-stage codegen, so the scan is
column-pruned to (id, text) and pipelines with any downstream gate.

The pattern dialect is deliberately restricted to the syntax subset
where Java regex (Spark) and RE2 (the DuckDB oracle) agree: character
classes, bounded repetition, alternation-free, ASCII `\\b` word
boundaries, no lookaround or backreferences.  That keeps every count
and every redacted byte independently re-derivable in ANSI-ish SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: redaction applies these in sequence.  Patterns are mutually
# non-overlapping on any input (email needs '@'; phone/SSN differ in
# middle-group width; IPv4 is dotted, not dashed), so the sequential
# rewrite is order-independent — the order is still pinned for
# determinism of the intermediate strings.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def _count(text: Column, pattern: str) -> Column:
    # regexp_extract_all(idx=0) = whole-match list; size() on a non-null
    # array is the match count (text columns here are non-null by
    # construction, and F.coalesce guards the general case).
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")),
                                       F.lit(pattern), 0))


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one `n_<type>` column per PII pattern plus the `n_pii` total.

    Pure codegen: the optimized plan is a single Project over the scan.
    """
    t = F.col(text_col)
    out = docs
    total = F.lit(0)
    for name, pat in PII_PATTERNS:
        c = _count(t, pat)
        out = out.withColumn(f"n_{name}", c)
        total = total + F.col(f"n_{name}")
    return out.withColumn("n_pii", total)


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Rewrite `text_col` with `<TYPE>` placeholders for every PII match.

    `regexp_replace` replaces ALL occurrences (Java `replaceAll`
    semantics == DuckDB's 'g' flag), applied per pattern in
    PII_PATTERNS order.
    """
    t: Column = F.col(text_col)
    for name, pat in PII_PATTERNS:
        t = F.regexp_replace(t, pat, f"<{name.upper()}>")
    return docs.withColumn(out_col, t)


def pii_report(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document PII summary: match counts per type, total, and the
    md5 of the redacted text (the full rewritten corpus is what a real
    pipeline sinks; the digest is what the contract hashes).
    Single-scan, shuffle-free.
    """
    counted = with_pii_counts(docs, text_col)
    red = redact_pii(counted, text_col)
    cols = [F.col(id_col)]
    cols += [F.col(f"n_{name}") for name, _ in PII_PATTERNS]
    cols += [F.col("n_pii"), F.md5(F.col("redacted")).alias("redacted_md5")]
    return red.select(*cols)
