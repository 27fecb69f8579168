"""Bench drift report: compare a fresh `bench.py` JSON line against the
previous round's driver artifact (BENCH_r{N}.json) and list every
per-query time above the 1.3x drift band — so regressions like round
3's funnel_counts 2.08x surface in the builder's own artifact, not
only in the judge's diff.

Usage:
  python bench.py > /tmp/bench_now.json       # run the bench first
  python tools/bench_drift.py /tmp/bench_now.json BENCH_r03.json
"""

from __future__ import annotations

import json
import re
import sys

NON_QUERY_KEYS = re.compile(
    r"^(metric|value|unit|sf|queries|scaling_|headline_|spatial_pipeline_)"
)


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        raw = f.read()
    # Driver artifacts wrap the bench line inside a "tail" string.
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "tail" in d and "queries" not in d:
        # The driver records only the (possibly mid-JSON-truncated) tail
        # of bench stdout; recover the per-query seconds by regex.
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', d["tail"])
        return {k: float(v) for k, v in pairs
                if not NON_QUERY_KEYS.match(k) and k != "n"}
    if not isinstance(d, dict):
        raise SystemExit(f"unparseable bench file {path}")
    qs = d.get("queries", {})
    return {k: float(v) for k, v in qs.items()
            if not NON_QUERY_KEYS.match(k)}


def main(now_path: str, prev_path: str, band: float = 1.3) -> int:
    now, prev = load_queries(now_path), load_queries(prev_path)
    shared = sorted(set(now) & set(prev))
    print(f"{len(shared)} comparable queries "
          f"({len(now) - len(shared)} new this round)")
    regressions = []
    for k in shared:
        r = now[k] / prev[k] if prev[k] > 0 else float("inf")
        if r > band:
            regressions.append((r, k, prev[k], now[k]))
    regressions.sort(reverse=True)
    if not regressions:
        print(f"no query exceeds the {band}x drift band")
    for r, k, p, n in regressions:
        print(f"  {k}: {p:.3f}s -> {n:.3f}s  ({r:.2f}x)")
    improved = sorted(
        ((now[k] / prev[k], k) for k in shared if now[k] / prev[k] < 1 / band)
    )
    print(f"{len(improved)} queries faster than 1/{band}x:")
    for r, k in improved[:10]:
        print(f"  {k}: {prev[k]:.3f}s -> {now[k]:.3f}s  ({r:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    now = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_now.json"
    prev = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r03.json"
    raise SystemExit(main(now, prev))
