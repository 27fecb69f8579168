"""Round-2 late additions: repetition stats, sessionization,
deterministic sampling — semantic ground truth computed independently
in pandas/python (the DuckDB oracle covers the SQL-parity side)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_repetition_stats_matches_python(spark):
    from s2_geometry_rust_spark.operators.text import with_repetition_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    got = (
        with_repetition_stats(docs)
        .select("doc_id", "text", "n_tokens", "n_distinct_tokens",
                "top_token_count", "repetition_nano", "top_token_frac_nano")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for doc_id, row in got.iterrows():
        toks = [t for t in row["text"].lower().split() if t]
        c = Counter(toks)
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct_tokens"] == len(c)
        top = max(c.values()) if c else 0
        assert row["top_token_count"] == top
        if toks:
            assert row["repetition_nano"] == round(
                (len(toks) - len(c)) / len(toks) * 1e9
            )
            assert row["top_token_frac_nano"] == round(top / len(toks) * 1e9)
        else:
            assert row["repetition_nano"] == 0


def test_repetition_stats_edge_cases(spark):
    from s2_geometry_rust_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a a a a"), (4, "A a b"), (5, "x")],
        ["doc_id", "text"],
    )
    got = (
        with_repetition_stats(df).toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[1, "n_tokens"] == 0 and got.loc[1, "repetition_nano"] == 0
    assert got.loc[2, "n_tokens"] == 0
    assert got.loc[3, "top_token_count"] == 4
    assert got.loc[3, "top_token_frac_nano"] == 1_000_000_000
    assert got.loc[3, "repetition_nano"] == 750_000_000
    # lowercased: "A a b" -> a twice
    assert got.loc[4, "n_distinct_tokens"] == 2
    assert got.loc[4, "top_token_count"] == 2
    assert got.loc[5, "repetition_nano"] == 0


def test_sessionize_gap_semantics(spark):
    from s2_geometry_rust_spark.operators.events import sessionize

    rows = [
        # user 1: 0s, 5m, then exactly-10m gap (boundary: >= gap starts
        # a NEW session — the F.session_window half-open convention),
        # then 10m - 1us stays in-session
        (1, 1, "2024-01-01 00:00:00"),
        (1, 2, "2024-01-01 00:05:00"),
        (1, 3, "2024-01-01 00:15:00"),
        (1, 4, "2024-01-01 00:24:59.999999"),
        # user 2: single event
        (2, 5, "2024-01-01 12:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts_str"]
    ).withColumn("ts", F.col("ts_str").cast("timestamp_ntz"))
    got = (
        sessionize(ev)
        .select("event_id", "session_idx")
        .toPandas()
        .set_index("event_id")["session_idx"]
    )
    assert got[1] == 1 and got[2] == 1
    assert got[3] == 2  # exactly-10m gap closes the window (>= gap)
    assert got[4] == 2  # 10m - 1us stays in session 2
    assert got[5] == 1


def test_session_stats_covers_all_events(spark):
    from s2_geometry_rust_spark.operators.events import session_stats

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    s = session_stats(ev).toPandas()
    assert s["n_events"].sum() == n
    # session spans never overlap per user and are ordered by index
    for _, g in s.groupby("user_id"):
        g = g.sort_values("session_idx")
        assert list(g["session_idx"]) == list(range(1, len(g) + 1))
        ends = g["end_ts"].tolist()
        starts = g["start_ts"].tolist()
        for i in range(1, len(g)):
            # gap between consecutive sessions must reach 10 minutes
            assert (starts[i] - ends[i - 1]) >= pd.Timedelta(minutes=10)
        assert all(a <= b for a, b in zip(starts, ends))


def test_stratified_sample_deterministic_and_uniform(spark):
    from s2_geometry_rust_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = stratified_sample(docs, ["lang"], 10).select(
        "doc_id", "lang", "sample_rank"
    ).toPandas().sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    # repartitioning must not change the sample (determinism across
    # cluster layouts)
    b = stratified_sample(docs.repartition(13), ["lang"], 10).select(
        "doc_id", "lang", "sample_rank"
    ).toPandas().sort_values(["lang", "sample_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    per = a.groupby("lang").size()
    avail = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, n in per.items():
        assert n == min(10, int(avail[lang]))


def test_bernoulli_sample_rate_and_determinism(spark):
    from s2_geometry_rust_spark.operators.sampling import bernoulli_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    kept = bernoulli_sample(docs, 200_000)  # 20%
    ids_a = {r[0] for r in kept.select("doc_id").collect()}
    ids_b = {
        r[0]
        for r in bernoulli_sample(docs.repartition(7), 200_000)
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b
    n = docs.count()
    assert 0.15 * n <= len(ids_a) <= 0.25 * n


def test_vocab_topk_matches_counter(spark):
    from s2_geometry_rust_spark.operators.vocab import vocab_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = vocab_topk(docs, 10).toPandas().sort_values("rank")
    rows = docs.select("doc_id", "text").collect()
    occ, dfreq = Counter(), Counter()
    for r in rows:
        toks = [t for t in r["text"].lower().split() if t]
        occ.update(toks)
        dfreq.update(set(toks))
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["token"]) == [w for w, _ in want]
    assert list(got["n_occurrences"]) == [n for _, n in want]
    assert list(got["n_docs"]) == [dfreq[w] for w, _ in want]


def test_ngram_counts_matches_counter(spark):
    from s2_geometry_rust_spark.operators.vocab import ngram_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        ngram_counts(docs, n=3, min_count=2)
        .toPandas()
        .set_index("ngram")["n"]
        .to_dict()
    )
    c = Counter()
    for r in docs.select("text").collect():
        toks = [t for t in r["text"].lower().split() if t]
        for i in range(len(toks) - 2):
            c[" ".join(toks[i:i + 3])] += 1
    want = {g: n for g, n in c.items() if n >= 2}
    assert got == want


def test_ngram_counts_short_docs(spark):
    from s2_geometry_rust_spark.operators.vocab import ngram_counts

    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "a b"), (4, "a b")], ["doc_id", "text"]
    )
    got = ngram_counts(df, n=2, min_count=1).toPandas()
    assert got.set_index("ngram")["n"].to_dict() == {"a b": 2}


def test_label_centroid_sums_exact(spark):
    import numpy as np
    from s2_geometry_rust_spark.operators.vocab import label_centroid_sums

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = label_centroid_sums(embs).toPandas()
    pdf = embs.toPandas()
    for (label, dim), row in got.set_index(["label", "dim"]).iterrows():
        sub = pdf[pdf["label"] == label]
        mat = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
        scaled = mat[:, dim] * 1e6
        want = int(
            np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64).sum()
        )
        assert row["sum_micro"] == want, (label, dim)
        assert row["n_vectors"] == len(sub)
    # exact under repartition (order independence of integer sums)
    got2 = label_centroid_sums(embs.repartition(17)).toPandas()
    a = got.sort_values(["label", "dim"]).reset_index(drop=True)
    b = got2.sort_values(["label", "dim"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_label_centroid_half_rounding_matches_duckdb(spark):
    """Exact round-half values DO reach the quantizer: a float32 odd
    multiple of 2^-7 scales to k + 1/2 (0.0078125 * 1e6 = 7812.5).
    The engine must use half-away-from-zero to agree with DuckDB/Spark
    round() — np.rint (half-even) would emit 7812 here."""
    import duckdb
    import numpy as np
    from s2_geometry_rust_spark.operators.vocab import label_centroid_sums

    vals = np.array([0.0078125, -0.0078125, 0.5, 0.25], dtype=np.float32)
    embs = spark.createDataFrame(
        [(0, [float(v) for v in vals], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    got = (
        label_centroid_sums(embs)
        .toPandas()
        .sort_values("dim")["sum_micro"]
        .tolist()
    )
    want = duckdb.sql(
        "SELECT CAST(round(CAST(v AS DOUBLE) * 1e6, 0) AS BIGINT) FROM "
        "(SELECT unnest([0.0078125::FLOAT, -0.0078125::FLOAT, "
        "0.5::FLOAT, 0.25::FLOAT]) AS v)"
    ).fetchall()
    assert got == [w[0] for w in want] == [7813, -7813, 500000, 250000]


def test_decontaminate_matches_python(spark):
    from s2_geometry_rust_spark.operators.vocab import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    got = (
        decontaminate(corpus, bench, n=3)
        .toPandas()
        .set_index("doc_id")["n_contaminated_ngrams"]
        .to_dict()
    )

    def grams(text, n=3):
        toks = [t for t in text.lower().split() if t]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    rows = docs.select("doc_id", "text").collect()
    bench_g = set()
    for r in rows:
        if r["doc_id"] < 10:
            bench_g |= grams(r["text"])
    want = {}
    for r in rows:
        if r["doc_id"] >= 10:
            k = len(grams(r["text"]) & bench_g)
            if k:
                want[r["doc_id"]] = k
    assert got == want and len(want) > 0


def test_sessionize_random_streams_vs_python(spark):
    """Seeded random event streams (clustered + uniform gaps, exact
    boundary multiples included) vs a pure-python sessionizer."""
    import numpy as np
    from s2_geometry_rust_spark.operators.events import sessionize

    rng = np.random.default_rng(42)
    gap_us = 10 * 60 * 1_000_000
    rows = []
    eid = 0
    for user in range(40):
        t = int(rng.integers(0, 10**9))
        for _ in range(int(rng.integers(1, 60))):
            # mix: sub-gap jitter, super-gap jumps, exact gap multiples
            r = rng.random()
            if r < 0.5:
                t += int(rng.integers(0, gap_us))
            elif r < 0.8:
                t += int(rng.integers(gap_us, 3 * gap_us))
            else:
                t += gap_us * int(rng.integers(1, 3))  # exact boundary
            rows.append((user, eid, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long"
    ).withColumn("ts", F.timestamp_micros("t_us"))
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev).select("event_id", "session_idx").collect()
    }
    # python reference: >= gap starts a new session
    want = {}
    by_user = {}
    for user, eid_, t in rows:
        by_user.setdefault(user, []).append((t, eid_))
    for user, evs in by_user.items():
        evs.sort()
        idx = 0
        prev = None
        for t, eid_ in evs:
            if prev is None or t - prev >= gap_us:
                idx += 1
            want[eid_] = idx
            prev = t
    assert got == want


def test_funnel_counts_matches_python(spark):
    from s2_geometry_rust_spark.operators.events import funnel_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["step"]: r["n_users"] for r in funnel_counts(ev).collect()
    }
    pdf = ev.select("user_id", "ts", "event_type").toPandas()
    steps = ("view", "click", "purchase")
    reached = {}
    for u, g in pdf.groupby("user_id"):
        t = None
        for k, s in enumerate(steps):
            cand = g[(g["event_type"] == s)]
            if t is not None:
                cand = cand[cand["ts"] > t]
            if len(cand) == 0:
                break
            t = cand["ts"].min()
            reached[s] = reached.get(s, 0) + 1
    assert got == reached
    assert got["view"] >= got["click"] >= got["purchase"] > 0


def test_retention_counts_matches_python(spark):
    from s2_geometry_rust_spark.operators.events import retention_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_counts(ev).collect()
    }
    pdf = ev.select("user_id", "ts").toPandas()
    pdf["d"] = pdf["ts"].dt.floor("D")
    active = pdf[["user_id", "d"]].drop_duplicates()
    first = active.groupby("user_id")["d"].min()
    want = {}
    for _, row in active.iterrows():
        d0 = first[row["user_id"]]
        # cohort_day is emitted as 'yyyy-MM-dd' text (dtype pinned so
        # the ns-vs-us timestamp gap can't trip a strict comparator)
        key = (d0.strftime("%Y-%m-%d"), (row["d"] - d0).days)
        want[key] = want.get(key, 0) + 1
    assert got == want
    # offset-0 cell counts every user exactly once across cohorts
    assert sum(v for (d0, off), v in got.items() if off == 0) == len(first)
