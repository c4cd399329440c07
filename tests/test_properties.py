"""Property tests (SURVEY.md §5.2.3) with independent oracles:

- resample's linear interpolation vs numpy.interp on random gapped series
- interpolation = identity when the grid equals the observations
- LOCF idempotence (re-LOCF of an already-dense series is a no-op)
- melt ∘ pivot = identity on unique keys
- array-valued interpolators (Timestream call shape) ≡ relational resample
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators import (
    create_time_series,
    melt,
    pivot_measures,
    resample,
)
from time_series_and_data_lakes_spark.operators.timeseries import (
    interpolate_linear_ts,
    interpolate_locf_ts,
    sequence_ts,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=s)


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),  # whole-second offsets
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda p: p[0],
)


@settings(max_examples=12, deadline=None)
@given(series_strategy)
def test_resample_linear_matches_numpy(spark, series):
    rows = [("k", _ts(s), float(v)) for s, v in sorted(series)]
    df = spark.createDataFrame(rows, "sensor_id string, time timestamp, temperature double")
    out = resample(
        df, ["sensor_id"], step="INTERVAL 1 SECOND", linear={"temperature": "temperature"}
    ).collect()
    xs = np.array([s for s, _ in sorted(series)], dtype=float)
    ys = np.array([v for _, v in sorted(series)], dtype=float)
    grid = np.arange(xs.min(), xs.max() + 1)
    want = np.interp(grid, xs, ys)
    got = {r["time"]: r["temperature"] for r in out}
    assert len(got) == len(grid)
    for g, w in zip(grid, want):
        assert abs(got[_ts(float(g))] - w) < 1e-9, (g, got[_ts(float(g))], w)


@settings(max_examples=10, deadline=None)
@given(series_strategy)
def test_locf_identity_and_idempotence(spark, series):
    rows = [("k", _ts(s), f"v{v:.0f}") for s, v in sorted(series)]
    df = spark.createDataFrame(rows, "sensor_id string, time timestamp, status string")
    once = resample(df, ["sensor_id"], step="INTERVAL 1 SECOND", locf={"status": "status"})
    # idempotence: LOCF over the already-dense output changes nothing
    twice = resample(once, ["sensor_id"], step="INTERVAL 1 SECOND", locf={"status": "status"})
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # identity at observation timestamps
    obs = {r[1]: r[2] for r in ((x["sensor_id"], x["time"], x["status"]) for x in df.collect())}
    for _, t, s in a:
        if t in obs:
            assert s == obs[t]


def test_melt_pivot_roundtrip_identity(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(i * 2), float(i * 3)) for i in range(50)],
        "id long, m1 double, m2 double, m3 double",
    )
    narrow = melt(df, dims=["id"], measures=["m1", "m2", "m3"])
    wide = pivot_measures(narrow, group_cols=["id"], measures=["m1", "m2", "m3"])
    got = sorted(map(tuple, wide.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_array_interpolators_equal_resample(spark):
    rows = [
        ("a", _ts(0), 10.0, "OK"),
        ("a", _ts(4), 30.0, "WARN"),
        ("a", _ts(9), 5.0, "OK"),
        ("b", _ts(2), 7.0, "ERR"),
    ]
    df = spark.createDataFrame(rows, "sensor_id string, time timestamp, temperature double, status string")

    # Timestream call shape: INTERPOLATE_*(CREATE_TIME_SERIES(...), SEQUENCE(...))
    temp_ts = create_time_series(
        df, ["sensor_id"], "time", "temperature",
        extra_aggs={"tmin": F.min("time"), "tmax": F.max("time")},
    )
    stat_ts = create_time_series(df, ["sensor_id"], "time", "status").withColumnRenamed("ts", "sts")
    joined = temp_ts.join(stat_ts, "sensor_id")
    grid = sequence_ts(F.col("tmin"), F.col("tmax"), "INTERVAL 1 SECOND")
    arr = joined.select(
        "sensor_id",
        interpolate_linear_ts(F.col("ts"), grid).alias("lin"),
        interpolate_locf_ts(F.col("sts"), grid).alias("locf"),
    )
    flat = (
        arr.select("sensor_id", F.explode(F.arrays_zip("lin", "locf")).alias("z"))
        .select(
            "sensor_id",
            F.col("z.lin.time").alias("time"),
            F.col("z.lin.value").alias("temperature"),
            F.col("z.locf.value").alias("status"),
        )
    )
    got = sorted(map(tuple, flat.collect()))
    want = sorted(
        map(
            tuple,
            resample(
                df,
                ["sensor_id"],
                step="INTERVAL 1 SECOND",
                linear={"temperature": "temperature"},
                locf={"status": "status"},
            ).select("sensor_id", "time", "temperature", "status").collect(),
        )
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
            min_size=4,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_quantize_roundtrip_error_bound(spark, vecs):
    # THE OPERATOR (not a reimplementation) must reconstruct every element
    # within scale/254 (half a quantization step) with codes in [-127, 127]
    from pyspark.sql import functions as F

    from time_series_and_data_lakes_spark.operators.similarity import (
        quantize_embedding,
    )

    dim = min(len(v) for v in vecs)
    rows = [(i, v[:dim]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    s, codes = quantize_embedding(F.col("embedding"))
    got = df.select("vec_id", s.alias("s"), codes.alias("c")).collect()
    by_id = {r["vec_id"]: r for r in got}
    for i, v in rows:
        r = by_id[i]
        assert all(-127 <= c <= 127 for c in r["c"])
        if r["s"] == 0.0:
            assert all(c == 0 for c in r["c"])
        else:
            for x, c in zip(v, r["c"]):
                assert abs(x - c * r["s"] / 127.0) <= r["s"] / 254.0 + 1e-9


def test_containment_pairs_match_brute_force(spark):
    # Directed containment join vs a brute-force set computation on small
    # synthetic docs (independent of the DuckDB oracle, which mirrors the
    # Spark expression tree and could mirror a shared bug).
    import itertools

    from time_series_and_data_lakes_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = [
        (0, "a b c d e f g"),
        (1, "a b c d e f g h i j k l m n"),      # contains doc 0's shingles
        (2, "x y z w q r s"),
        (3, "a b c d e f g"),                      # exact duplicate of 0
        (4, "completely different words here now"),
    ]
    def sh(text, n=3):
        toks = text.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    threshold = 0.9
    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        A, B = sh(ta), sh(tb)
        inter = len(A & B)
        if A and inter / len(A) >= threshold:
            want.add((ia, ib))
        if B and inter / len(B) >= threshold:
            want.add((ib, ia))

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["contained_id"], r["container_id"])
        for r in ngram_containment_pairs(df, threshold=threshold, persist=False).collect()
    }
    assert got == want
    assert (0, 1) in got and (1, 0) not in got  # asymmetry observed


def test_pack_sequences_report_matches_python_reference(spark):
    from time_series_and_data_lakes_spark.operators.curation import (
        pack_sequences_report,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, f"src{i % 2}", " ".join("w" for _ in range(rng.randint(0, 40))))
        for i in range(30)
    ]
    L = 64
    want = {}
    for src in ("src0", "src1"):
        docs = sorted((i, t) for i, s, t in rows if s == src)
        cum = 0
        boundary = 0
        for _i, t in docs:
            ln = len(t.split(" "))  # split('') -> [''] -> 1, as in Spark
            before, cum = cum, cum + ln
            if ln > 0 and before // L != (cum - 1) // L:
                boundary += 1
        n_seq = -(-cum // L)
        want[src] = (len(docs), cum, n_seq, n_seq * L - cum, boundary)

    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    from pyspark.sql import functions as F
    from time_series_and_data_lakes_spark.operators.dedup import tokens_col

    got = {
        r["source"]: (
            r["n_docs"],
            r["total_tokens"],
            r["n_sequences"],
            r["tail_padding"],
            r["n_boundary_docs"],
        )
        for r in pack_sequences_report(
            df, F.size(tokens_col(F.col("text"))), seq_len=L, id_col="doc_id"
        ).collect()
    }
    assert got == want


def test_edit_distance_join_finds_all_long_doc_pairs(spark):
    # The blocking recall bound from the docstring: a pair within
    # max_distance whose docs are long enough is always found; verified
    # distances equal Python's textbook Levenshtein.
    from time_series_and_data_lakes_spark.operators.dedup import edit_distance_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    docs = [
        (0, base),
        (1, base.replace("quick", "quack")),            # distance 1
        (2, base.replace("lazy dog", "hazy hog")),      # distance 2
        (3, "entirely unrelated words compose this other document of similar length"),
        (4, base.replace("today", "tomorrow morning")), # tail edit
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in edit_distance_pairs(df, max_distance=12, persist=False).collect()
    }
    want = {
        (a, b): lev(ta, tb)
        for (a, ta) in docs
        for (b, tb) in docs
        if a < b and lev(ta, tb) <= 12
    }
    assert got == want and (0, 1) in got and got[(0, 1)] == 1


def test_semantic_dedup_matches_brute_force(spark):
    # SemDeDup vs a brute-force Python replay (assignment by nearest
    # centroid with smallest-id ties, drop on any lower-id in-cluster
    # neighbor above threshold) on a small random embedding set.
    import math
    import random

    from time_series_and_data_lakes_spark.operators.similarity import semantic_dedup

    rng = random.Random(23)
    dim, n = 8, 40
    vecs = {i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(n)}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    cents = {i: vecs[i] for i in range(4)}
    assign = {
        i: min(cents, key=lambda c: (-cos(vecs[i], cents[c]), c)) for i in vecs
    }
    thr = 0.5
    want = {}
    for i in vecs:
        lower = [
            j for j in vecs
            if j < i and assign[j] == assign[i] and cos(vecs[j], vecs[i]) >= thr
        ]
        if lower:
            k = min(lower)
            want[i] = (assign[i], k)

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["kept_id"])
        for r in semantic_dedup(
            df, df.filter(F.col("vec_id") < 4), threshold=thr
        ).collect()
    }
    assert got == want and want  # non-trivial fixture


def test_ewma_query_matches_python_fold(spark, sf_dir):
    import math

    from time_series_and_data_lakes_spark import queries as Q

    got = {
        r["sensor_id"]: (r["n_obs"], r["ewma_temperature"])
        for r in Q.QUERIES["analytics_ewma"](spark, sf_dir).collect()
    }
    rows = sorted(
        (r["sensor_id"], r["time"], r["temperature"])
        for r in Q.sensor_obs(spark, sf_dir).collect()
    )
    series: dict = {}
    for s, t, v in rows:
        series.setdefault(s, []).append(v)
    for s, vals in series.items():
        acc = None
        for x in vals:
            acc = x if acc is None else 0.2 * x + 0.8 * acc
        n, e = got[s]
        assert n == len(vals)
        assert math.isclose(e, acc, rel_tol=0, abs_tol=0), s  # bit-exact


def test_repetition_stats_matches_python_reference(spark):
    from collections import Counter

    from time_series_and_data_lakes_spark.operators.text import repetition_stats

    docs = [
        (0, "a b a b a b a b"),          # heavy bigram repetition
        (1, "all distinct words here"),
        (2, "x"),                         # single token -> NULL bigram cols
        (3, "y y"),                       # one bigram, rep tokens
        (4, "spam spam spam spam spam"),
        (5, "a a a a"),                   # overlapping bigram claims > chars
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, text in docs:
        toks = text.split(" ")
        r = got[i]
        assert r["n_toks"] == len(toks)
        assert r["n_distinct_toks"] == len(set(toks))
        assert r["rep_token_frac"] == (len(toks) - len(set(toks))) / len(toks)
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if not grams:
            assert r["top_bigram"] is None
            assert r["top_bigram_n"] is None
            assert r["top_bigram_char_frac"] is None
        else:
            counts = Counter(grams)
            best_n = max(counts.values())
            best = min(g for g, c in counts.items() if c == best_n)
            assert (r["top_bigram"], r["top_bigram_n"]) == (best, best_n)
            assert r["top_bigram_char_frac"] == min(
                1.0, best_n * len(best) / len(text)
            )
    # the overlap cap engages: "a a a a"'s 3 overlapping "a a" occurrences
    # claim 9 chars of a 7-char doc -> capped at 1.0
    assert got[5]["top_bigram_char_frac"] == 1.0
    assert got[4]["top_bigram"] == "spam spam"


def test_top_tokens_matches_python_reference(spark, sf_dir):
    from collections import Counter

    from time_series_and_data_lakes_spark import queries as Q
    from time_series_and_data_lakes_spark.queries_ext import _load_docs

    docs = [(r["doc_id"], r["text"]) for r in _load_docs(spark, sf_dir).collect()]
    total = Counter()
    dfreq = Counter()
    for _i, text in docs:
        toks = text.split(" ")
        total.update(toks)
        dfreq.update(set(toks))
    want = sorted(
        ((n, tok) for tok, n in total.items()), key=lambda t: (-t[0], t[1])
    )[:50]
    got = [
        (r["n_total"], r["token"], r["n_docs"])
        for r in Q.QUERIES["text_top_tokens"](spark, sf_dir).collect()
    ]
    assert [(n, t) for n, t, _d in got] == want
    assert all(d == dfreq[t] for _n, t, d in got)


def test_ohlc_matches_python_reference(spark, sf_dir):
    from time_series_and_data_lakes_spark import queries as Q

    got = {
        r["sensor_id"]: (r["n_obs"], r["open"], r["high"], r["low"], r["close"])
        for r in Q.QUERIES["g9_ohlc_per_sensor"](spark, sf_dir).collect()
    }
    series = {}
    for r in Q.sensor_obs(spark, sf_dir).collect():
        series.setdefault(r["sensor_id"], []).append((r["time"], r["temperature"]))
    for s, pts in series.items():
        pts.sort()
        vals = [v for _t, v in pts]
        assert got[s] == (len(pts), vals[0], max(vals), min(vals), vals[-1]), s
