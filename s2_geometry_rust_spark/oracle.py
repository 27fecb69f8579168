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


def hilbert_leaf_cte(points_sql: str) -> str:
    """WITH-clause prefix ending in relation ``leaf(point_id, face,
    cell_id BIGINT)`` — the full reference encoding in SQL."""
    steps = []
    prev = "s0"
    for k in range(7, -1, -1):
        nm = f"s{8 - k}"
        steps.append(
            f"{nm} AS (SELECT p.point_id, p.face, p.i, p.j, "
            f"p.n | ((l.r::UBIGINT >> 2) << {k * 8}) AS n, "
            f"(l.r::UBIGINT & 3) AS bits "
            f"FROM {prev} p JOIN lut l ON l.idx = CAST(p.bits + "
            f"(((p.i >> {k * 4}) & 15) << 6) + (((p.j >> {k * 4}) & 15) << 2)"
            f" AS BIGINT))"
        )
        prev = nm
    chain = ",\n".join(steps)
    return f"""
WITH lut(idx, r) AS (VALUES {lookup_pos_sql_values()}),
pts AS ({points_sql}),
fuv AS (
  SELECT point_id,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
         WHEN abs(y) >= abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
         ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END AS face,
    x, y, z FROM pts),
uv AS (
  SELECT point_id, face,
    CASE face WHEN 0 THEN y/x WHEN 3 THEN -z/(-x) WHEN 1 THEN -x/y WHEN 4 THEN z/(-y) WHEN 2 THEN -y/z ELSE -x/(-z) END AS u,
    CASE face WHEN 0 THEN z/x WHEN 3 THEN -y/(-x) WHEN 1 THEN z/y WHEN 4 THEN x/(-y) WHEN 2 THEN -x/z ELSE y/(-z) END AS v
  FROM fuv),
ij AS (
  SELECT point_id, face,
    CAST(trunc(LEAST(GREATEST(0.5*(u+1.0)*1073741824.0, 0.0), 1073741823.0)) AS UBIGINT) AS i,
    CAST(trunc(LEAST(GREATEST(0.5*(v+1.0)*1073741824.0, 0.0), 1073741823.0)) AS UBIGINT) AS j
  FROM uv),
s0 AS (SELECT point_id, face, i, j, (face::UBIGINT << 60) AS n, (face::UBIGINT & 1) AS bits FROM ij),
{chain},
leaf AS (
  SELECT point_id, face,
    CASE WHEN hv >= {U63} THEN CAST(hv - {U64} AS BIGINT) ELSE CAST(hv AS BIGINT) END AS cell_id
  FROM (SELECT point_id, face, n::HUGEINT * 2 + 1 AS hv FROM {prev})
)
"""


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
