"""10x scale-up smoke (round-5 verdict item 6): SCALE.md's linearity
claims are plan-verified everywhere; this adds ONE empirical datapoint.

Generates a synthetic ~sf1 slice (10x the bench scale) of the three
tables the headline scale paths read — events, documents, embeddings —
then runs the flagship resample, MinHash-LSH dedup, IVF top-k, the
real-pixel transcode chain (multimodal_resize_pixels — the
Python-heaviest family), and the two iterative families
(dedup_components large-star/small-star, ann_ivf_kmeans_topk Lloyd
rounds) end-to-end at sf0.1 AND at 10x, asserting completion (no task
OOM) and roughly-linear wall time.

Upscaling preserves the workload's SHAPE, not just its bytes:
- events: 10x the keys (replicas get disjoint user_id ranges), same time
  span — the resample grid per key is unchanged, total work ~10x.
- documents: replicas are NEW documents drawn from the same vocabulary
  via doc-seeded hashing, NOT copies — copying verbatim would add ~10
  exact duplicates per text and grow the LSH candidate-pair count
  quadratically, measuring an artifact instead of the operator.
- embeddings: replicas perturb each vector per-replica so centroid
  assignment stays balanced; IVF cost is row-linear regardless.

Gated behind TSDL_SCALE_SMOKE=1: the 10x runs cost minutes, which the
per-round driver pytest should not pay. Run manually:

    TSDL_SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py -q -s

Measured numbers live in SCALE.md's "Empirical 10x smoke" appendix.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark import queries as Q
from time_series_and_data_lakes_spark.queries_ext import ann_ivf_topk, dedup_minhash_lsh

pytestmark = pytest.mark.skipif(
    not os.environ.get("TSDL_SCALE_SMOKE"),
    reason="set TSDL_SCALE_SMOKE=1 to run the 10x scale smoke (~minutes)",
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10

_VOCAB = (
    "spark batch part line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "shuffle broadcast plan stage task codec vector index bucket probe scale"
).split()


def _upscale(spark, out_dir: str) -> None:
    rep = spark.range(1, REPLICAS).withColumnRenamed("id", "rep")

    ev = Q.load(spark, SF01, "events")
    ev_new = ev.crossJoin(rep).select(
        (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * F.lit(1_000_000)).alias("user_id"),
        "event_type",
        (F.col("value") * (F.lit(1.0) + F.col("rep") * F.lit(0.001))).alias("value"),
        "props",
    )
    ev.unionByName(ev_new).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = Q.load(spark, SF01, "documents")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_vocab = len(_VOCAB)
    fresh_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(48)),
            lambda j: F.element_at(
                vocab,
                (
                    F.pmod(F.xxhash64(F.col("doc_id"), F.col("rep"), j), F.lit(n_vocab))
                    + F.lit(1)
                ).cast("int"),
            ),
        ),
    )
    docs_new = (
        docs.crossJoin(rep)
        .withColumn("text", fresh_text)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    docs.unionByName(docs_new).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    em = Q.load(spark, SF01, "embeddings")
    em_new = em.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * F.lit(100_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x * (F.lit(1.0) + F.col("rep") * F.lit(0.003))).cast("float"),
        ).alias("embedding"),
        "label",
    )
    em.unionByName(em_new).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def _timed(fn, spark, sf_dir: str) -> float:
    # same end-to-end forcing as bench.py: full execution, no collect
    start = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def test_headline_scale_paths_are_roughly_linear_at_10x(spark, tmp_path):
    big = str(tmp_path / "sf1")
    _upscale(spark, big)
    assert (
        spark.read.parquet(f"{big}/events.parquet").count()
        == REPLICAS * Q.load(spark, SF01, "events").count()
    )

    from time_series_and_data_lakes_spark.queries_ext import multimodal_resize_pixels

    results = {}
    for name, fn in [
        ("q1_flagship_interpolate", Q.q1_flagship_interpolate),
        ("dedup_minhash_lsh", dedup_minhash_lsh),
        ("ann_ivf_topk", ann_ivf_topk),
        # round-7 (verdict item 6): the Python-heaviest family — Arrow
        # mapInPandas encode -> nn-resize -> decode over real pixels — to
        # pin Arrow-batch memory behavior at 10x payload count
        ("multimodal_resize_pixels", multimodal_resize_pixels),
        # round-8 (verdict item 5): the two most expensive bench families
        # without a 10x datapoint — both ITERATIVE (large-star/small-star
        # rounds; Lloyd iterations), where a super-linear blow-up would
        # hide from every single-pass plan gate
        ("dedup_components", Q.QUERIES["dedup_components"]),
        ("ann_ivf_kmeans_topk", Q.QUERIES["ann_ivf_kmeans_topk"]),
        # round-9 (verdict item 4): the one top-cost family whose blow-up
        # mode is CANDIDATE-COUNT explosion (inverted-index self-join)
        # rather than iteration count — candidate cardinality asserted
        # sub-quadratic below
        ("dedup_ngram_jaccard", Q.QUERIES["dedup_ngram_jaccard"]),
    ]:
        fn(spark, SF01).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        t1 = min(_timed(fn, spark, SF01) for _ in range(2))
        spark.catalog.clearCache()
        t10 = min(_timed(fn, spark, big) for _ in range(2))
        spark.catalog.clearCache()
        results[name] = (t1, t10, t10 / t1)
        # roughly linear: 10x data may cost up to ~2x the proportional
        # time (fixed overheads, deeper shuffles) but never the 100x a
        # quadratic candidate blow-up would show
        assert t10 / t1 < 20.0, (name, t1, t10)

    # Verify-stage candidate cardinality for the inverted-index join: at
    # threshold=0.0 every candidate pair (shares >=1 unpruned shingle)
    # passes the jaccard filter, so the public API returns EXACTLY the
    # verify-stage candidate set. Quadratic blow-up at 10x docs would be
    # ~100x candidates; the max_df stop-list must hold it well under that.
    from time_series_and_data_lakes_spark.operators.dedup import ngram_jaccard_pairs
    from time_series_and_data_lakes_spark.queries_ext import _load_docs

    cands = {}
    for label, sf in (("sf0.1", SF01), ("10x", big)):
        cands[label] = ngram_jaccard_pairs(
            _load_docs(spark, sf), threshold=0.0, max_df=5
        ).count()
        spark.catalog.clearCache()
    cand_ratio = cands["10x"] / max(cands["sf0.1"], 1)
    assert cand_ratio < 30.0, cands

    print("\n10x scale smoke (sf0.1 -> ~sf1, local[32], min-of-2):")
    for name, (t1, t10, ratio) in results.items():
        print(f"  {name}: {t1:.2f}s -> {t10:.2f}s (x{ratio:.1f})")
    print(
        f"  ngram-jaccard verify-stage candidates: {cands['sf0.1']} -> "
        f"{cands['10x']} (x{cand_ratio:.1f}; quadratic would be ~x100)"
    )
