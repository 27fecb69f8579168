"""DuckDB oracle-SQL generators for the driver's correctness gate.

The centerpiece is a pure-SQL re-implementation of the engine's leaf
cell-id encoding (cube-face projection + linear ST + 4-bit-lookup
Hilbert encode, mirroring /root/reference/src/cell_id.rs:175-238 and
507-557): the 1024-entry LOOKUP_POS table is embedded as a VALUES list
and the 8 lookup iterations are unrolled as chained CTEs.  Because the
point derivation below uses only +,-,*,/ and integer mod (all exactly
rounded IEEE-754 ops — no trig), DuckDB and Spark produce *bit-identical*
doubles, so the oracle verifies the Hilbert core bit-for-bit.

Cell-id hierarchy math on signed BIGINT (parent/range/level) is
two's-complement bit arithmetic, identical to the u64 semantics.
"""

from __future__ import annotations

from .kernels.hilbert import lookup_pos_sql_values

U63 = 9223372036854775808  # 2^63
U64 = 18446744073709551616  # 2^64


def derived_points_sql(table: str = "customer", key: str = "c_custkey") -> str:
    """Deterministic pseudo-random direction vector per key.

    Integer mod then double division: every op is exactly rounded, so
    any IEEE engine computes the same bits.  The vector is never zero
    (components are (int - 498.5)/498.5-style with integer numerators).
    The projection is gnomonic (ratios), so no normalization is needed.
    """
    return f"""
SELECT {key} AS point_id,
       (({key}*37) % 997) / 498.5 - 1.0 AS x,
       (({key}*73) % 991) / 495.5 - 1.0 AS y,
       (({key}*101) % 983) / 491.5 - 1.0 AS z
FROM {table}
"""


def _hilbert_chain(points_sql: str, prefix: str) -> str:
    """CTE fragments (no WITH keyword) from a points relation to
    ``{prefix}leaf(point_id, face, cell_id BIGINT)``; the shared ``lut``
    table must be emitted once by the caller."""
    p = prefix
    steps = []
    prev = f"{p}s0"
    for k in range(7, -1, -1):
        nm = f"{p}s{8 - k}"
        steps.append(
            f"{nm} AS (SELECT q.point_id, q.face, q.i, q.j, "
            f"q.n | ((l.r::UBIGINT >> 2) << {k * 8}) AS n, "
            f"(l.r::UBIGINT & 3) AS bits "
            f"FROM {prev} q JOIN lut l ON l.idx = CAST(q.bits + "
            f"(((q.i >> {k * 4}) & 15) << 6) + (((q.j >> {k * 4}) & 15) << 2)"
            f" AS BIGINT))"
        )
        prev = nm
    chain = ",\n".join(steps)
    return f"""
{p}pts AS ({points_sql}),
{p}fuv AS (
  SELECT point_id,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
         WHEN abs(y) >= abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
         ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END AS face,
    x, y, z FROM {p}pts),
{p}uv AS (
  SELECT point_id, face,
    CASE face WHEN 0 THEN y/x WHEN 3 THEN -z/(-x) WHEN 1 THEN -x/y WHEN 4 THEN z/(-y) WHEN 2 THEN -y/z ELSE -x/(-z) END AS u,
    CASE face WHEN 0 THEN z/x WHEN 3 THEN -y/(-x) WHEN 1 THEN z/y WHEN 4 THEN x/(-y) WHEN 2 THEN -x/z ELSE y/(-z) END AS v
  FROM {p}fuv),
{p}ij AS (
  SELECT point_id, face,
    CAST(trunc(LEAST(GREATEST(0.5*(u+1.0)*1073741824.0, 0.0), 1073741823.0)) AS UBIGINT) AS i,
    CAST(trunc(LEAST(GREATEST(0.5*(v+1.0)*1073741824.0, 0.0), 1073741823.0)) AS UBIGINT) AS j
  FROM {p}uv),
{p}s0 AS (SELECT point_id, face, i, j, (face::UBIGINT << 60) AS n, (face::UBIGINT & 1) AS bits FROM {p}ij),
{chain},
{p}leaf AS (
  SELECT point_id, face,
    CASE WHEN hv >= {U63} THEN CAST(hv - {U64} AS BIGINT) ELSE CAST(hv AS BIGINT) END AS cell_id
  FROM (SELECT point_id, face, n::HUGEINT * 2 + 1 AS hv FROM {prev})
)
"""


def hilbert_leaf_cte(points_sql: str) -> str:
    """WITH-clause prefix ending in relation ``leaf(point_id, face,
    cell_id BIGINT)`` — the full reference encoding in SQL."""
    return (
        f"WITH lut(idx, r) AS (VALUES {lookup_pos_sql_values()}),"
        + _hilbert_chain(points_sql, "")
    )


def parent_sql(col: str, level: int) -> str:
    """parent-at-level on signed BIGINT (cell_id.rs:297-305); leaf input
    is always below the target level so no identity guard is needed."""
    lsb = 1 << (2 * (30 - level))
    return f"(({col} & {-lsb}) | {lsb})"


def token_sql(col: str) -> str:
    """Hex token (cell_id.rs:369-383) for nonzero ids."""
    return (
        f"CASE WHEN {col} = 0 THEN 'X' ELSE "
        f"coalesce(nullif(regexp_replace(printf('%016x', {col}), '0+$', ''), ''), '0') END"
    )


def leaf_assign_sql(table: str = "customer", key: str = "c_custkey") -> str:
    cte = hilbert_leaf_cte(derived_points_sql(table, key))
    return (
        cte
        + f"SELECT point_id, cell_id, face, {token_sql('cell_id')} AS token FROM leaf"
    )


def tile_counts_sql(level: int, table: str = "customer",
                    key: str = "c_custkey") -> str:
    cte = hilbert_leaf_cte(derived_points_sql(table, key))
    p = parent_sql("cell_id", level)
    return (
        cte
        + f"SELECT {p} AS tile_id, {token_sql(p)} AS tile_token, "
        f"count(*) AS n_points FROM leaf GROUP BY 1, 2"
    )


def face_counts_sql(table: str = "customer", key: str = "c_custkey") -> str:
    cte = hilbert_leaf_cte(derived_points_sql(table, key))
    return cte + "SELECT face, count(*) AS n_points FROM leaf GROUP BY face"


# ---------------------------------------------------------------------------
# geometry joins on derived lat/lng (affine from keys — no trig, bit-exact)
# ---------------------------------------------------------------------------

def derived_latlng_sql(table: str = "customer", key: str = "c_custkey") -> str:
    return f"""
SELECT {key} AS point_id,
       (({key}*37) % 181)::DOUBLE - 90.0 + 0.25 AS lat,
       (({key}*73) % 361)::DOUBLE - 180.0 + 0.25 AS lng
FROM {table}
"""


RECTS_SQL = """
(VALUES ('band', -5.0, 5.0, -30.0, 30.0),
        ('wrap', -10.0, 10.0, 170.0, -170.0),
        ('north', 60.0, 90.0, -180.0, 180.0))
  AS r(region_id, lat_lo, lat_hi, lng_lo, lng_hi)
"""


def point_in_rect_sql(table: str = "customer", key: str = "c_custkey") -> str:
    return f"""
WITH pts AS ({derived_latlng_sql(table, key)})
SELECT p.point_id, r.region_id, p.lat, p.lng
FROM pts p CROSS JOIN {RECTS_SQL}
WHERE p.lat BETWEEN r.lat_lo AND r.lat_hi
  AND (CASE WHEN r.lng_lo > r.lng_hi
            THEN p.lng >= r.lng_lo OR p.lng <= r.lng_hi
            ELSE p.lng BETWEEN r.lng_lo AND r.lng_hi END)
"""


CENTERS_SQL = """
(VALUES ('c0', 0.5, 0.5, 0.5),
        ('c1', -0.25, 0.8, -0.1),
        ('c2', 0.9, -0.3, 0.2))
  AS c(center_id, cx, cy, cz)
"""


def distance_join_sql(radius_chord2: float = 0.05,
                      table: str = "customer", key: str = "c_custkey") -> str:
    return f"""
WITH pts AS ({derived_points_sql(table, key)})
SELECT p.point_id, c.center_id,
       (p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy) + (p.z-c.cz)*(p.z-c.cz) AS chord2
FROM pts p CROSS JOIN {CENTERS_SQL}
WHERE (p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy) + (p.z-c.cz)*(p.z-c.cz) <= {radius_chord2!r}
"""


def knn_sql(k: int = 10, q_table: str = "supplier", q_key: str = "s_suppkey",
            n_queries: int = 20, c_table: str = "customer",
            c_key: str = "c_custkey") -> str:
    return f"""
WITH q AS (SELECT * FROM ({derived_points_sql(q_table, q_key)}) WHERE point_id < {n_queries}),
c AS ({derived_points_sql(c_table, c_key)}),
pairs AS (
  SELECT q.point_id AS query_id, c.point_id AS neighbor_id,
         (q.x-c.x)*(q.x-c.x) + (q.y-c.y)*(q.y-c.y) + (q.z-c.z)*(q.z-c.z) AS chord2
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY chord2, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, rank, chord2 FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# text / dedup oracles over the documents table
# ---------------------------------------------------------------------------

def union_leaf_cells_sql(table: str = "customer",
                         key: str = "c_custkey") -> str:
    """Unions built from derived points: union_id = point_id % 10,
    member cell = parent at level (point_id % 21 + 10).  leaf count =
    4^(30-level) — POWER is exact here (4^20 < 2^53)."""
    cte = hilbert_leaf_cte(derived_points_sql(table, key))
    return cte + """
, members AS (
  SELECT point_id % 10 AS union_id,
         point_id % 21 + 10 AS lv,
         cell_id
  FROM leaf
), cells AS (
  SELECT union_id,
         (cell_id & -CAST(power(4, 30 - lv) AS BIGINT)) | CAST(power(4, 30 - lv) AS BIGINT) AS cell_id,
         lv
  FROM members
), dedup AS (
  SELECT DISTINCT union_id, cell_id, lv FROM cells
)
SELECT union_id,
       CAST(SUM(CAST(power(4, 30 - lv) AS HUGEINT)) AS BIGINT) AS leaf_cells_covered,
       count(*) AS n_cells
FROM dedup GROUP BY union_id
"""


def raster_join_sql(level: int = 6) -> str:
    """Raster-tile <-> vector equi-join: customer points against the
    distinct supplier tile set at the given level (two independent
    Hilbert chains sharing one lut)."""
    p = parent_sql("cell_id", level)
    return (
        f"WITH lut(idx, r) AS (VALUES {lookup_pos_sql_values()}),"
        + _hilbert_chain(derived_points_sql("customer", "c_custkey"), "")
        + ","
        + _hilbert_chain(derived_points_sql("supplier", "s_suppkey"), "b_")
        + f"""
, raster AS (
  SELECT DISTINCT {p} AS tile_id FROM b_leaf
)
SELECT l.point_id, r.tile_id
FROM leaf l JOIN raster r ON {p.replace('cell_id', 'l.cell_id')} = r.tile_id
"""
    )


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


def token_counts_sql() -> str:
    return r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
FROM documents
"""


def text_quality_sql() -> str:
    return r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
         length(text) AS n_chars_calc
  FROM documents
), m AS (
  SELECT doc_id, n_chars_calc, len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS n_stop,
         n_chars_calc - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM t
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens > 0 THEN n_chars_calc::DOUBLE / n_tokens ELSE 0.0 END AS avg_token_len,
       CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_chars_calc > 0 THEN n_punct::DOUBLE / n_chars_calc ELSE 0.0 END AS punct_ratio,
       LEAST(n_tokens::DOUBLE / 32.0, 1.0) * 0.5
       + LEAST((CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.3
       + (1.0 - LEAST((CASE WHEN n_chars_calc > 0 THEN n_punct::DOUBLE / n_chars_calc ELSE 0.0 END) * 4.0, 1.0)) * 0.2
         AS quality_score
FROM m
"""


def lang_id_sql() -> str:
    markers = {
        "en": ("the", "a", "and", "of"),
        "de": ("der", "die", "das", "und"),
        "fr": ("le", "la", "et", "les"),
        "es": ("el", "la", "los", "y"),
    }
    score_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN {m!r})) AS s_{lg}"
        for lg, m in markers.items()
    )
    langs = list(markers)
    best = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " END"
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id,
         {score_cols}
  FROM t
)
SELECT doc_id, {case} AS lang_pred FROM s
"""


def events_hourly_sql() -> str:
    """Hourly rollup with order-independent aggregates (integer cent
    sums commute; double sums would not)."""
    return """
SELECT date_trunc('hour', ts) AS ts_hour, event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""
