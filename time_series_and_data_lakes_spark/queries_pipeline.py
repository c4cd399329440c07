"""Corpus-curation query catalog: deterministic splits, sampling, data
mixing, benchmark decontamination, and kNN labeling as driver-contract
queries with DuckDB oracles.

These are the pipeline stages between "raw documents" and "training
mixture" (BASELINE.json north star) layered on the lake-side analytics the
reference runs over its `data-lake/` tables (reference README.md:411-425).
Every oracle mirrors the Spark expression tree token-for-token (same
md5-derived hashes, same fold association for cosine), so value hashes are
bit-exact cross-engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators import curation as C
from time_series_and_data_lakes_spark.operators import graph as G
from time_series_and_data_lakes_spark.operators import similarity as S
from time_series_and_data_lakes_spark.operators import text as X
from time_series_and_data_lakes_spark.queries_ext import (
    _cosine_sql,
    _DIM,
    _lsh_pairs_oracle,
    _N_PLANES,
    _dot_sql,
    _h64_sql,
    _lang_score_cols,
    _load_docs,
    _load_embeddings,
    _quality_case_sql,
    _SHINGLES,
    _TOKS,
)

# --------------------------------------------------------------------------
# Deterministic train/valid/test split (hash of id, stratification readout)
# --------------------------------------------------------------------------

_SPLIT_CUTS = (80, 90)


def pipe_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash split, reported as per-(lang, split) doc and char
    counts — the stratification matrix a corpus report publishes."""
    docs = C.hash_split(_load_docs(spark, sf_dir), cuts=_SPLIT_CUTS)
    return docs.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
    )


PIPE_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT lang, n_chars,
         CASE WHEN h < {_SPLIT_CUTS[0]} THEN 'train'
              WHEN h < {_SPLIT_CUTS[1]} THEN 'valid'
              ELSE 'test' END AS split
  FROM (SELECT lang, n_chars,
               {_h64_sql("doc_id::VARCHAR", "split")} % 100 AS h
        FROM documents)
)
SELECT lang, split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM assigned GROUP BY lang, split
"""


# --------------------------------------------------------------------------
# Deterministic per-source sample (reservoir-equivalent, reproducible)
# --------------------------------------------------------------------------

_SAMPLE_K = 5


def pipe_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = C.deterministic_sample(
        _load_docs(spark, sf_dir), group_col="source", k=_SAMPLE_K
    )
    return out.select("source", "doc_id", "sample_rank")


PIPE_SAMPLE_ORACLE = f"""
SELECT source, doc_id, sample_rank FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_h64_sql("coalesce(doc_id::VARCHAR, '')", "sample")}, doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {_SAMPLE_K}
"""


# --------------------------------------------------------------------------
# Token-budget allocation per source ("data mixing"), exact bigint math
# --------------------------------------------------------------------------

_MIX_BUDGET = 100_000


def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    return C.token_budget_allocation(
        docs,
        token_count_col=X.token_count(F.col("text")),
        group_col="source",
        budget=_MIX_BUDGET,
    )


PIPE_BUDGET_ORACLE = f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs, sum(len({_TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
), total AS (
  SELECT sum(n_tokens)::BIGINT AS total_tokens FROM per_source
)
SELECT source, n_docs, n_tokens,
       (({_MIX_BUDGET} * n_tokens) // total_tokens)::BIGINT AS alloc_tokens
FROM per_source, total
"""


# --------------------------------------------------------------------------
# Benchmark decontamination: shared word-3-gram counts vs a held-out set
# --------------------------------------------------------------------------

_BENCH_SOURCE = "src0"
_DECON_THRESHOLD = 10


def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    return C.ngram_decontaminate(
        docs,
        benchmark_filter=F.col("source") == _BENCH_SOURCE,
        threshold=_DECON_THRESHOLD,
    )


PIPE_DECON_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source, {_SHINGLES} AS sh
  FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)
), bench AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE source = '{_BENCH_SOURCE}'
), cand AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE source <> '{_BENCH_SOURCE}'
), hits AS (
  SELECT doc_id, count(*) AS n FROM cand JOIN bench USING (shingle) GROUP BY doc_id
)
SELECT base.doc_id,
       coalesce(hits.n, 0)::BIGINT AS n_shared_shingles,
       (CASE WHEN coalesce(hits.n, 0) >= {_DECON_THRESHOLD} THEN 1 ELSE 0
        END)::BIGINT AS contaminated
FROM (SELECT doc_id FROM sh WHERE source <> '{_BENCH_SOURCE}') base
LEFT JOIN hits ON base.doc_id = hits.doc_id
"""


# --------------------------------------------------------------------------
# kNN majority-vote labeling over the embeddings table
# --------------------------------------------------------------------------

_KNN_QUERIES = 10
_KNN_K = 5


def pipe_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_embeddings(spark, sf_dir)
    return C.knn_label_vote(emb, F.col("vec_id") < _KNN_QUERIES, k=_KNN_K)


PIPE_KNN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < {_KNN_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
         {_cosine_sql('qv', 'c.v')} AS score
  FROM v c, q WHERE c.vec_id <> q.query_id
), top AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS rnk
    FROM scored
  ) WHERE rnk <= {_KNN_K}
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM top
  WHERE label IS NOT NULL GROUP BY query_id, label
)
SELECT query_id, label::BIGINT AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label NULLS LAST) AS r
  FROM votes
) WHERE r = 1
"""


# --------------------------------------------------------------------------
# End-to-end quality funnel: lang filter → quality gate → near-dup
# representatives, staged counts in ONE corpus scan
# --------------------------------------------------------------------------

_FUNNEL_LANG = "en"
_FUNNEL_QUALITY = 1.0


def pipe_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel every corpus report starts with: raw docs →
    language-identified → quality-gated → near-duplicate representatives
    (distinct min-shingle fingerprints). All four stage counts come from
    ONE corpus scan via conditional aggregation — at 100 TB the funnel
    readout costs exactly one pass, not one pass per stage; the only
    exchange carries aggregation partials (countDistinct adds the standard
    two-phase expand on the fingerprint, still partial-aggregated
    map-side)."""
    docs = _load_docs(spark, sf_dir)
    # Project the per-row features ONCE before aggregating: aggregate
    # update expressions get no common-subexpression elimination, so
    # embedding the HOF-heavy lang/quality expressions directly in the
    # conditional aggregates would re-run them per aggregate per row.
    feats = docs.select(
        (X.predicted_lang(F.col("text")) == _FUNNEL_LANG).alias("__is_lang"),
        (X.quality_score(F.col("text")) >= _FUNNEL_QUALITY).alias("__good_q"),
        X.fingerprint(F.col("text")).alias("__fp"),
    )
    good = F.col("__is_lang") & F.col("__good_q")
    return feats.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("__is_lang"), 1).otherwise(0)).cast("bigint").alias("n_lang"),
        F.sum(F.when(good, 1).otherwise(0)).cast("bigint").alias("n_quality"),
        F.countDistinct(F.when(good, F.col("__fp"))).alias("n_representatives"),
    )


def _funnel_oracle() -> str:
    langs = sorted(X.LANG_STOPWORDS)
    score_cols = _lang_score_cols()
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    # null-text guard mirrors _lang_oracle/predicted_lang (this copy once
    # LACKED it — every null CASE condition fell through to the ELSE
    # label, counting null-text docs as the last language)
    plang = (
        "CASE WHEN text IS NULL THEN NULL "
        + " ".join(f"WHEN s_{lang} = {m} THEN '{lang}'" for lang in langs[:-1])
        + f" ELSE '{langs[-1]}' END"
    )
    quality = _quality_case_sql("toks")
    fp = f"list_min(list_transform({_SHINGLES}, s -> {_h64_sql('s', 0)}))"
    return f"""
WITH sc AS (
  SELECT doc_id, text, toks, {', '.join(score_cols)}
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
), feat AS (
  SELECT doc_id,
         {plang} AS plang,
         ({quality}) AS q,
         {fp} AS fp
  FROM sc
)
SELECT count(*)::BIGINT AS n_raw,
       sum(CASE WHEN plang = '{_FUNNEL_LANG}' THEN 1 ELSE 0 END)::BIGINT AS n_lang,
       sum(CASE WHEN plang = '{_FUNNEL_LANG}' AND q >= {_FUNNEL_QUALITY}
                THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       count(DISTINCT CASE WHEN plang = '{_FUNNEL_LANG}' AND q >= {_FUNNEL_QUALITY}
                           THEN fp END)::BIGINT AS n_representatives
FROM feat
"""


PIPE_FUNNEL_ORACLE = _funnel_oracle()


# --------------------------------------------------------------------------
# Weighted mixture assembly (epoch composition by source proportions)
# --------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def pipe_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest mixture achieving 50/30/20 source proportions, selected by
    deterministic hash thresholds (operators/curation.py::weighted_mixture
    — map-side filter against a broadcast rate table, corpus never
    shuffled). Reported as the per-source summary: availability, target
    keep fraction, and docs actually kept (binomial around frac·avail)."""
    docs = _load_docs(spark, sf_dir).select("doc_id", "source")
    kept = C.weighted_mixture(docs, _MIX_WEIGHTS)
    return (
        kept.groupBy("source")
        .agg(
            F.first("n_avail").alias("n_avail"),
            F.first("keep_frac").alias("keep_frac"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .orderBy("source")
    )


def _mix_oracle() -> str:
    vals = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))
    h = _h64_sql("doc_id::VARCHAR", "mix")
    return f"""
WITH base AS (
  SELECT doc_id, source FROM documents
  WHERE source IN ({', '.join(repr(s) for s in sorted(_MIX_WEIGHTS))})
), wtab(source, w) AS (VALUES {vals}),
avail AS (
  SELECT source, count(*) AS n_avail FROM base GROUP BY source
), rates AS (
  SELECT source, n_avail, w * cap / n_avail AS keep_frac FROM (
    SELECT a.source, n_avail, w, min(n_avail / w) OVER () AS cap
    FROM avail a JOIN wtab USING (source)
  )
)
SELECT b.source, any_value(n_avail) AS n_avail,
       any_value(keep_frac) AS keep_frac,
       count(*) AS n_kept
FROM base b JOIN rates USING (source)
WHERE CAST({h} AS DOUBLE) < keep_frac * 1152921504606846976.0
GROUP BY b.source
ORDER BY b.source
"""


PIPE_MIX_ORACLE = _mix_oracle()


# --------------------------------------------------------------------------
# IVF-backed kNN labeling — the scale path once the query set outgrows the
# broadcast brute-force scorer (VERDICT r2 item 5)
# --------------------------------------------------------------------------

_KNN_IVF_CENTROIDS = 16
_KNN_IVF_PROBE = 4


def pipe_knn_label_vote_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote labeling with the IVF neighbor search: each query
    scores only its n_probe inverted lists (~|corpus|·n_probe/n_centroids
    vectors) instead of the full corpus — the composition to switch to when
    the query set is no longer broadcast-small. Deterministic centroid set
    (vec_id < 16 stands in for k-means) so the oracle replicates the
    quantizer; vote/tie-break semantics identical to pipe_knn_label_vote."""
    emb = _load_embeddings(spark, sf_dir)
    return C.knn_label_vote(
        emb,
        F.col("vec_id") < _KNN_QUERIES,
        k=_KNN_K,
        centroids=emb.filter(F.col("vec_id") < _KNN_IVF_CENTROIDS),
        n_probe=_KNN_IVF_PROBE,
    )


def _knn_ivf_oracle() -> str:
    # Same inverted-list probe SQL as queries_ext.ANN_IVF_ORACLE (assignment
    # and probes by row_number over the full centroid cross), feeding the
    # same vote/tie-break tail as PIPE_KNN_ORACLE.
    dot_vc = _dot_sql("n.v", "c.cv")
    dot_qc = _dot_sql("q.v", "c.cv")
    dot_qa = _dot_sql("p.qv", "a.v")
    return f"""
WITH v0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
  FROM embeddings
), n AS (
  SELECT vec_id, v, label, sqrt({_dot_sql('v', 'v')}) AS nrm FROM v0
), cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
  WHERE vec_id < {_KNN_IVF_CENTROIDS}
), assigned AS (
  SELECT vec_id, v, nrm, label, cid AS list_id FROM (
    SELECT n.vec_id, n.v, n.nrm, n.label, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY {dot_vc} / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n, cent c
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, qv, qn, cid AS list_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qn, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {dot_qc} / (q.nrm * c.cn) DESC, c.cid) AS rn
    FROM n q, cent c WHERE q.vec_id < {_KNN_QUERIES}
  ) WHERE rn <= {_KNN_IVF_PROBE}
), top AS (
  SELECT query_id, label FROM (
    SELECT p.query_id, a.label,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY {dot_qa} / (p.qn * a.nrm) DESC, a.vec_id) AS rnk
    FROM assigned a JOIN probes p ON a.list_id = p.list_id
    WHERE a.vec_id <> p.query_id
  ) WHERE rnk <= {_KNN_K}
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM top
  WHERE label IS NOT NULL GROUP BY query_id, label
)
SELECT query_id, label::BIGINT AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label NULLS LAST) AS r
  FROM votes
) WHERE r = 1
"""


PIPE_KNN_IVF_ORACLE = _knn_ivf_oracle()


# --------------------------------------------------------------------------
# SemDeDup: embedding-space semantic deduplication (cluster, then drop
# within-cluster near-duplicates) — similarity.py::semantic_dedup
# --------------------------------------------------------------------------

_SEMDEDUP_CENTROIDS = 16
_SEMDEDUP_THRESHOLD = 0.3


def pipe_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup audit trail: each dropped vector with the in-cluster
    lower-id duplicate that keeps it out of the corpus (SemDeDup, Abbas et
    al. 2023). Deterministic centroid set (vec_id < 16 stands in for
    k-means, as in pipe_knn_label_vote_ivf) so the oracle replays the
    quantizer; threshold 0.3 sits in the tail of this fixture's
    near-orthogonal cosine distribution (max pairwise ~0.51)."""

    emb = _load_embeddings(spark, sf_dir)
    return S.semantic_dedup(
        emb,
        emb.filter(F.col("vec_id") < _SEMDEDUP_CENTROIDS),
        threshold=_SEMDEDUP_THRESHOLD,
    )


def _semdedup_oracle() -> str:
    dot_nc = _dot_sql("n.v", "c.cv")
    dot_kd = _dot_sql("k.v", "d.v")
    return f"""
WITH v0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm FROM v0
), cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
  WHERE vec_id < {_SEMDEDUP_CENTROIDS}
), assigned AS (
  SELECT vec_id, v, nrm, cid AS cluster_id FROM (
    SELECT n.vec_id, n.v, n.nrm, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
             ORDER BY {dot_nc} / (n.nrm * c.cn) DESC, c.cid) AS rn
    FROM n, cent c
  ) WHERE rn = 1
), pairs AS (
  SELECT d.vec_id, d.cluster_id, k.vec_id AS kept_id,
         {dot_kd} / (k.nrm * d.nrm) AS score
  FROM assigned k JOIN assigned d
    ON k.cluster_id = d.cluster_id AND k.vec_id < d.vec_id
  WHERE {dot_kd} / (k.nrm * d.nrm) >= {_SEMDEDUP_THRESHOLD}
)
SELECT vec_id, cluster_id, kept_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY kept_id) AS rn
  FROM pairs
) WHERE rn = 1
"""


PIPE_SEMDEDUP_ORACLE = _semdedup_oracle()


# --------------------------------------------------------------------------
# Label propagation over the embedding similarity graph — the multi-hop
# generalization of the kNN vote (operators/graph.py::label_propagation)
# --------------------------------------------------------------------------

_LP_SEED_MOD = 5
_LP_ITERS = 2
_LP_EDGE_THRESHOLD = 0.0


def pipe_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised labeling: clamp every 5th vector's label (the
    seeds), hide the rest, and propagate by synchronous majority vote for
    2 rounds over the hyperplane-LSH similarity graph (same-bucket pairs
    with non-negative cosine). Unweighted integer votes + smallest-label
    tie-break keep the fixture bit-reproducible in the chained-CTE
    oracle."""

    emb = _load_embeddings(spark, sf_dir)
    pairs = S.lsh_bucket_pairs(
        emb, n_planes=_N_PLANES, dim=_DIM, threshold=_LP_EDGE_THRESHOLD
    ).select("id_a", "id_b")
    edges = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    seeds = emb.filter(F.col("vec_id") % _LP_SEED_MOD == 0)
    return G.label_propagation(
        edges,
        seeds,
        iters=_LP_ITERS,
        src_col="id_a",
        dst_col="id_b",
        node_col="vec_id",
        label_col="label",
    )


def _lp_oracle() -> str:
    ctes = [
        f"pairs AS ({_lsh_pairs_oracle(threshold=_LP_EDGE_THRESHOLD)})",
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
        " UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs)",
        f"seeds AS (SELECT vec_id AS node, label FROM embeddings"
        f" WHERE vec_id % {_LP_SEED_MOD} = 0)",
        "lab0 AS (SELECT node, label FROM seeds)",
    ]
    for i in range(1, _LP_ITERS + 1):
        ctes.append(
            f"""votes{i} AS (
  SELECT e.dst AS node, l.label, count(*)::BIGINT AS votes
  FROM edges e JOIN lab{i - 1} l ON e.src = l.node
  GROUP BY e.dst, l.label
)"""
        )
        ctes.append(
            f"""new{i} AS (
  SELECT node, label, votes FROM (
    SELECT *, row_number() OVER (PARTITION BY node
                                 ORDER BY votes DESC, label) AS rn
    FROM votes{i}
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""lab{i} AS (
  SELECT node, label FROM seeds
  UNION ALL
  SELECT n.node, n.label FROM new{i} n
  WHERE n.node NOT IN (SELECT node FROM seeds)
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT n.node AS vec_id, n.label, n.votes
FROM new{_LP_ITERS} n
WHERE n.node NOT IN (SELECT node FROM seeds)
"""
    )


PIPE_LP_ORACLE = _lp_oracle()


# --------------------------------------------------------------------------
# Sequence-packing report (curation.py::pack_sequences_report)
# --------------------------------------------------------------------------

_PACK_SEQ_LEN = 512


def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    return C.pack_sequences_report(
        docs, X.token_count(F.col("text")), seq_len=_PACK_SEQ_LEN
    )


PIPE_PACK_ORACLE = f"""
WITH sized AS (
  SELECT source, doc_id, len({_TOKS})::BIGINT AS len,
         (sum(len({_TOKS})) OVER (PARTITION BY source ORDER BY doc_id, len({_TOKS})
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
  FROM documents
)
SELECT source, count(*) AS n_docs,
       max(cum)::BIGINT AS total_tokens,
       ceil(max(cum) / {_PACK_SEQ_LEN})::BIGINT AS n_sequences,
       (ceil(max(cum) / {_PACK_SEQ_LEN}) * {_PACK_SEQ_LEN} - max(cum))::BIGINT
         AS tail_padding,
       sum(CASE WHEN len > 0
                AND floor((cum - len) / {_PACK_SEQ_LEN})
                    <> floor((cum - 1) / {_PACK_SEQ_LEN})
                THEN 1 ELSE 0 END)::BIGINT AS n_boundary_docs
FROM sized GROUP BY source
"""


# --------------------------------------------------------------------------
# Quality-score decile matrix (threshold-tuning readout)
# --------------------------------------------------------------------------

_N_DECILES = 10


def pipe_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score distribution in deciles — the readout a curation run
    publishes to pick its quality cutoff ('the top 3 deciles survive').
    Deterministic ntile over (quality, doc_id); the reported min/max are
    actual column values (no float aggregation), so the gate is exact.
    The deciles window is a single-partition sort over |corpus| rows — at
    real scale serve it from a sampled frame or a histogram; the exact
    form is the fixture-scale reference."""

    docs = _load_docs(spark, sf_dir)
    # A null text is no document: quality_score null-propagates (like every
    # SQL expression), but ntile ORDERS nulls engine-dependently (Spark
    # nulls-first vs DuckDB nulls-last), so unranked docs must not enter
    # the decile window at all.
    q = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", X.quality_score(F.col("text")).alias("q")
    )
    w = Window.orderBy(F.asc("q"), F.asc("doc_id"))
    return (
        q.withColumn("decile", F.ntile(_N_DECILES).over(w).cast("bigint"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
    )


def _quality_deciles_oracle() -> str:
    quality = _quality_case_sql(_TOKS)
    return f"""
WITH scored AS (
  SELECT doc_id, ({quality}) AS q FROM documents WHERE text IS NOT NULL
)
SELECT decile, count(*) AS n_docs,
       min(q) AS min_quality, max(q) AS max_quality
FROM (
  SELECT doc_id, q,
         ntile({_N_DECILES}) OVER (ORDER BY q, doc_id)::BIGINT AS decile
  FROM scored
) GROUP BY decile
"""


PIPE_DECILES_ORACLE = _quality_deciles_oracle()


# Single source of truth: (name, program, oracle) — the paired-dict form
# this replaces let a query be registered without its oracle twin.
_CATALOG: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    ("pipe_split_train_test", pipe_split_train_test, PIPE_SPLIT_ORACLE),
    ("pipe_sample_per_source", pipe_sample_per_source, PIPE_SAMPLE_ORACLE),
    ("pipe_token_budget", pipe_token_budget, PIPE_BUDGET_ORACLE),
    ("pipe_decontaminate", pipe_decontaminate, PIPE_DECON_ORACLE),
    ("pipe_knn_label_vote", pipe_knn_label_vote, PIPE_KNN_ORACLE),
    ("pipe_knn_label_vote_ivf", pipe_knn_label_vote_ivf, PIPE_KNN_IVF_ORACLE),
    ("pipe_mix_weights", pipe_mix_weights, PIPE_MIX_ORACLE),
    ("pipe_quality_funnel", pipe_quality_funnel, PIPE_FUNNEL_ORACLE),
    ("pipe_semdedup", pipe_semdedup, PIPE_SEMDEDUP_ORACLE),
    ("pipe_label_propagation", pipe_label_propagation, PIPE_LP_ORACLE),
    ("pipe_pack_sequences", pipe_pack_sequences, PIPE_PACK_ORACLE),
    ("pipe_quality_deciles", pipe_quality_deciles, PIPE_DECILES_ORACLE),
]

PIPELINE_QUERIES = {n: f for n, f, _ in _CATALOG}
PIPELINE_ORACLES = {n: s for n, _, s in _CATALOG}
