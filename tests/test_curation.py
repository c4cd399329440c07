"""Semantic probes for the corpus-curation operators on tiny synthetic
frames — the oracle gate proves cross-engine equality, these prove the
operators mean what they claim (verify-skill rule: a bug written into both
sides still hash-matches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_hash_split_is_stable_under_repartition(spark):
    df = _docs(spark, [(i, "s", "x") for i in range(200)])
    a = {r.doc_id: r.split for r in C.hash_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in C.hash_split(df.repartition(7, "doc_id")).collect()
    }
    assert a == b
    # all three splits occur at n=200 with an 80/10/10 cut
    assert set(a.values()) == {"train", "valid", "test"}
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.6 * 200 < n_train < 0.95 * 200


def test_hash_split_does_not_depend_on_other_rows(spark):
    big = C.hash_split(_docs(spark, [(i, "s", "x") for i in range(100)]))
    small = C.hash_split(_docs(spark, [(7, "s", "x")]))
    assert (
        small.collect()[0].split
        == {r.doc_id: r.split for r in big.collect()}[7]
    )


def test_deterministic_sample_same_rows_every_run(spark):
    df = _docs(spark, [(i, f"src{i % 3}", "x") for i in range(90)])
    a = {(r.source, r.doc_id) for r in C.deterministic_sample(df, k=4).collect()}
    b = {
        (r.source, r.doc_id)
        for r in C.deterministic_sample(df.repartition(11), k=4).collect()
    }
    assert a == b
    for src in ("src0", "src1", "src2"):
        assert sum(1 for s, _ in a if s == src) == 4


def test_token_budget_allocation_exact_and_bounded(spark):
    df = _docs(
        spark,
        [(1, "a", "w " * 9 + "w"), (2, "a", "w " * 9 + "w"), (3, "b", "w " * 29 + "w")],
    )
    out = {
        r.source: r
        for r in C.token_budget_allocation(
            df, token_count_col=F.size(F.split("text", " ")), budget=1000
        ).collect()
    }
    # a: 20 tokens, b: 30 tokens, total 50 → exact integer allocation
    assert out["a"].n_tokens == 20 and out["b"].n_tokens == 30
    assert out["a"].alloc_tokens == 400 and out["b"].alloc_tokens == 600
    assert sum(r.alloc_tokens for r in out.values()) <= 1000


def test_token_budget_allocation_survives_pretraining_scale_products(spark):
    # budget * n_tokens for a trillion-token budget over a ~100 TB corpus
    # (~2.5e13 tokens) is ~1e25 — past bigint, inside the decimal(38,0)
    # widening; the allocation must stay exact, not ANSI-overflow
    budget = 10**12
    rows = [(1, "web", 2 * 10**13), (2, "books", 5 * 10**12)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n bigint")
    out = {
        r.source: r
        for r in C.token_budget_allocation(
            df, token_count_col=F.col("n"), budget=budget
        ).collect()
    }
    total = 25 * 10**12
    assert out["web"].alloc_tokens == budget * 20 * 10**12 // total
    assert out["books"].alloc_tokens == budget * 5 * 10**12 // total
    assert sum(r.alloc_tokens for r in out.values()) <= budget


def test_ngram_decontaminate_counts_shared_shingles(spark):
    df = _docs(
        spark,
        [
            (1, "bench", "a b c d"),        # bench shingles: {a b c, b c d}
            (2, "web", "a b c x y z"),      # shares exactly {a b c}
            (3, "web", "a b c d e"),        # shares {a b c, b c d}
            (4, "web", "q r"),              # < 3 tokens → 0 shingles
            (5, "web", "u v w"),            # no overlap
        ],
    )
    out = {
        r.doc_id: r
        for r in C.ngram_decontaminate(
            df, benchmark_filter=F.col("source") == "bench", threshold=2
        ).collect()
    }
    assert set(out) == {2, 3, 4, 5}  # bench doc excluded from candidates
    assert out[2].n_shared_shingles == 1 and out[2].contaminated == 0
    assert out[3].n_shared_shingles == 2 and out[3].contaminated == 1
    assert out[4].n_shared_shingles == 0
    assert out[5].n_shared_shingles == 0


def test_knn_label_vote_majority_and_tiebreak(spark):
    # 1-D embeddings: queries at 0.0-ish; neighbors cluster by sign.
    rows = [
        (0, [1.0, 0.0], 9),      # query; own label must not matter
        (10, [1.0, 0.1], 5),
        (11, [1.0, 0.2], 5),
        (12, [1.0, 0.3], 5),
        (13, [1.0, -0.1], 3),
        (14, [1.0, -0.2], 3),
        (15, [-1.0, 5.0], 7),    # far away, never in top-5
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    out = C.knn_label_vote(emb, F.col("vec_id") == 0, k=5).collect()
    assert len(out) == 1
    # top-5 = {10,11,12,13,14}: labels 5×3 votes vs 3×2 votes → 5 wins
    assert out[0].predicted_label == 5 and out[0].votes == 3

    # force a 2-2 tie: cosine is symmetric in the second coordinate, so
    # top-4 = {10, 13, 11, 14} with labels {5:2, 3:2} → smaller label wins
    out2 = C.knn_label_vote(emb, F.col("vec_id") == 0, k=4).collect()
    assert out2[0].predicted_label == 3 and out2[0].votes == 2


def test_weighted_mixture_capacity_and_determinism(spark):
    # 100 docs in a, 40 in b, weights 60/40: capacity is bound by b
    # (T = 40/0.4 = 100), so a keeps frac 0.6 and b keeps frac 1.0
    rows = [(i, "a" if i < 100 else "b") for i in range(140)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = C.weighted_mixture(df, {"a": 0.6, "b": 0.4})
    fracs = {r["source"]: r["keep_frac"] for r in kept.select("source", "keep_frac").distinct().collect()}
    assert abs(fracs["a"] - 0.6) < 1e-12
    assert abs(fracs["b"] - 1.0) < 1e-12
    got = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["b"] == 40  # binding source keeps everything
    # hash-threshold counts are binomial around 60, not exact
    assert 40 <= got["a"] <= 80
    # reproducible: same rows on a rerun and under different partitioning
    a1 = sorted(r["doc_id"] for r in kept.collect())
    a2 = sorted(r["doc_id"] for r in C.weighted_mixture(df.repartition(7), {"a": 0.6, "b": 0.4}).collect())
    assert a1 == a2
    # sources not in the weight map are excluded entirely
    assert kept.filter(~F.col("source").isin("a", "b")).count() == 0


def test_weighted_mixture_releases_cache_on_success(spark):
    # the success path used to leak the persisted availability counts for
    # the session lifetime (round-8 ADVICE); both paths must unpersist
    import pytest as _pytest

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(i, "a" if i < 30 else "b") for i in range(50)],
        "doc_id bigint, source string",
    )
    kept = C.weighted_mixture(df, {"a": 0.5, "b": 0.5})
    assert jsc.getPersistentRDDs().size() == before
    assert kept.count() > 0  # the materialized rate table still executes
    with _pytest.raises(ValueError, match="zero available rows"):
        C.weighted_mixture(df, {"a": 0.5, "missing": 0.5})
    assert jsc.getPersistentRDDs().size() == before


def test_weighted_mixture_rejects_zero_row_sources(spark):
    # a weighted source with no rows makes the target proportions
    # unachievable (capacity 0); silently ignoring it would return a
    # 100/0 split labeled 50/50 — e.g. on a typo'd source name
    import pytest as _pytest

    rows = [(i, "a") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    with _pytest.raises(ValueError, match="zero available rows.*'books'"):
        C.weighted_mixture(df, {"a": 0.5, "books": 0.5})


def test_knn_label_vote_string_labels(spark):
    # non-integral labels must come back AS IS — a hardcoded bigint cast
    # would throw CAST_INVALID_INPUT under ANSI for 'spam'/'ham' classes
    rows = [
        (0, [1.0, 0.0], "x"),
        (10, [1.0, 0.1], "spam"),
        (11, [1.0, 0.2], "spam"),
        (12, [1.0, -0.1], "ham"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label string"
    )
    out = C.knn_label_vote(emb, F.col("vec_id") == 0, k=3).collect()
    assert len(out) == 1
    assert out[0].predicted_label == "spam" and out[0].votes == 2


def test_knn_vote_null_labels_cross_engine(spark, tmp_path):
    # The NULL-label contract is latent in the driver testdata (labels are
    # non-null there): pin it cross-engine on a synthetic lake — NULL-labeled
    # neighbors must not vote, and both engines must agree bit-exactly.
    import math
    import duckdb

    from time_series_and_data_lakes_spark.queries_pipeline import PIPE_KNN_ORACLE
    from tests.oracle_util import canonicalize

    rows = []
    for i in range(40):
        vec = [math.sin(0.1 * (i + 1) * (d + 1)) for d in range(64)]
        label = None if i % 3 == 0 else i % 4  # heavy NULL presence
        rows.append((i, vec, label))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = C.knn_label_vote(emb, F.col("vec_id") < 10, k=5).toPandas()
    assert got["predicted_label"].notna().all()  # NULLs never win the vote

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet/*.parquet'"
    )
    want = con.execute(PIPE_KNN_ORACLE).df()
    a, b = canonicalize(got), canonicalize(want)
    assert list(a.columns) == list(b.columns) and len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
