"""Corpus-curation operators for training-data pipelines: deterministic
splits, per-group sampling, mixture/budget allocation, and benchmark
decontamination.

These extend the reference's lake-side analytics (`data-lake/` tables,
Athena-style queries — reference README.md:411-425) with the operations a
100 TB pretraining-corpus pipeline runs between "raw documents" and
"training mixture". Everything is a narrow projection or a single keyed
shuffle; nothing collects to the driver.

Determinism contract: all pseudo-randomness is the md5-derived 60-bit
integer hash from :func:`..operators.dedup.h64`, which DuckDB reproduces
token-for-token — so splits, samples, and allocations are bit-identical
cross-engine and stable across reruns/cluster sizes (the property that
makes a training mixture reproducible).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators.dedup import h64, shingles_col
from time_series_and_data_lakes_spark.operators.similarity import cosine_topk, ivf_topk


def hash_bucket(id_col: Column, seed: str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from an id column — the split
    assignment survives reruns, repartitioning, and corpus growth (a doc's
    bucket never depends on other rows). Pure projection: no shuffle."""
    return h64(id_col.cast("string"), seed=seed) % n_buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split",
    cuts: tuple[int, int] = (80, 90),
) -> DataFrame:
    """Deterministic train/valid/test assignment by id hash.

    At 100 TB this is the only split strategy that works: sampling by
    ``rand()`` is irreproducible across retries, and splitting by file
    boundary leaks near-duplicates across splits. Hash-of-id is a map-side
    projection — no shuffle, no state.
    """
    b = hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        "split",
        F.when(b < cuts[0], F.lit("train"))
        .when(b < cuts[1], F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def deterministic_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    seed: str = "sample",
) -> DataFrame:
    """Top-k-by-hash sample per group: the distributed, reproducible
    replacement for per-group reservoir sampling.

    Ordering by ``h64(id)`` is a uniform permutation, so the k smallest
    hashes are a uniform k-sample — and the same k rows come back on every
    run and any partitioning. One shuffle on the group key; with many
    groups the per-group state is k rows (bounded memory at 100 TB).

    A NULL id coalesces to '' before hashing (the export.py shard
    convention): unhashed it shifts every rank in the group (r10 find).
    """
    h = h64(F.coalesce(F.col(id_col).cast("string"), F.lit("")), seed=seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def token_budget_allocation(
    df: DataFrame,
    token_count_col: Column,
    group_col: str = "source",
    budget: int = 100_000,
) -> DataFrame:
    """Proportional token-budget allocation per group ("data mixing").

    Aggregates per-group token totals (one shuffle over |groups| keys,
    map-side combined), then derives the grand total as an unpartitioned
    window over the |groups|-row aggregate — the corpus is scanned ONCE and
    only the tiny aggregate passes through the single-partition window
    (sources are few by nature). Allocation is
    ``floor(budget * group_tokens / total_tokens)`` in exact arithmetic —
    no floating point, so the mixture is bit-reproducible and the sum never
    exceeds the budget. The product is widened to ``decimal(38,0)`` before
    the integral division: a trillion-token budget times a 100 TB corpus's
    ~2.5e13 tokens is ~1e25, past bigint's 2^63 but comfortably inside 38
    digits (the quotient is back under the budget, so the result stays
    bigint).
    """
    per_group = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col.cast("bigint")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return (
        per_group.withColumn("__total", F.sum("n_tokens").over(w))
        .withColumn(
            "alloc_tokens",
            F.expr(
                f"(CAST({budget} AS DECIMAL(38,0)) * n_tokens) div __total"
            ),
        )
        .drop("__total")
    )


def weighted_mixture(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Assemble a training mixture with target source proportions: the
    largest mixture achievable under the weights, selected by deterministic
    hash-threshold sampling.

    Capacity is bound by the scarcest source: ``T = min(avail_s / w_s)``;
    each source then keeps fraction ``w_s * T / avail_s`` of its docs
    (exactly 1.0 for the binding source). Selection is ``h64(id) <
    frac * 2^60`` — a pure map-side projection against a broadcast
    per-source rate table, so the corpus is never shuffled: the cost is two
    columnar scans (one to count per-source availability, one to filter).
    The alternative single-scan design (per-source counts as a window over
    the full corpus) shuffles every row on the source key and stalls on the
    dominant source; two scans is the right trade at 100 TB. Hash
    thresholds make the sample reproducible across retries and partitioning
    and give binomial (not exact) per-source counts — the price of not
    ranking, which would need the full per-source sort.

    Returns the kept rows with ``n_avail`` and ``keep_frac`` attached.
    """

    if not weights:
        raise ValueError("weights must name at least one source")
    for src, w in weights.items():
        if not math.isfinite(w) or w <= 0:
            # a zero/negative/non-finite weight otherwise surfaces as a
            # runtime DIVIDE_BY_ZERO deep inside the capacity window —
            # reject at construction, naming the offender. A source the
            # mixture should exclude is expressed by omitting it.
            raise ValueError(
                f"mixture weight for {src!r} must be a positive finite "
                f"number, got {w!r}"
            )
    w_items = sorted(weights.items())
    wmap = F.create_map(*[F.lit(x) for kv in w_items for x in kv])
    base = df.filter(F.col(group_col).isin(*weights))
    avail = (
        base.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn("__w", wmap[F.col(group_col)])
    ).persist()  # |sources| rows — lets the validation collect below reuse
    # the count scan instead of paying a third corpus pass
    # A weighted source with ZERO available rows makes the capacity
    # T = min(avail/w) equal 0 — but it would simply be ABSENT from the
    # aggregate, the min would ignore it, and the returned "mixture" would
    # silently carry the wrong proportions (a typo'd source name sells a
    # 100/0 split as 50/50). Validate by name instead.
    # |sources| rows: the unpartitioned window is free here
    rates_plan = (
        avail.withColumn(
            "__cap", F.min(F.col("n_avail") / F.col("__w")).over(Window.partitionBy())
        )
        .withColumn("keep_frac", F.col("__w") * F.col("__cap") / F.col("n_avail"))
        .select(group_col, "n_avail", "keep_frac")
    )
    try:
        present = {r[0] for r in avail.select(group_col).collect()}
        missing = sorted(set(weights) - present)
        if missing:
            raise ValueError(
                f"weighted sources with zero available rows: {missing} — "
                "capacity min(avail/w) is 0, so the target proportions are "
                "unachievable; drop them from weights or fix the corpus"
            )
        # Materialize the |sources|-row rate table driver-side so the
        # returned plan carries a local relation rather than a live
        # dependency on the cached count scan — which lets `avail` be
        # unpersisted HERE instead of leaking its blocks for the session
        # lifetime (the success path never freed them before).
        rates = df.sparkSession.createDataFrame(
            rates_plan.collect(), schema=rates_plan.schema
        )
    finally:
        avail.unpersist()
    return (
        base.join(F.broadcast(rates), group_col)
        .filter(
            h64(F.col(id_col).cast("string"), seed=seed).cast("double")
            < F.col("keep_frac") * F.lit(float(2**60))
        )
    )


def ngram_decontaminate(
    docs: DataFrame,
    benchmark_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: int = 10,
) -> DataFrame:
    """Benchmark decontamination: count distinct word n-grams each candidate
    document shares with a held-out benchmark set, flag heavy overlap.

    The benchmark's distinct-shingle set is small (eval suites are KBs-MBs
    against a 100 TB corpus), so it is deduplicated and **broadcast**; the
    corpus streams through one scan, exploding each doc's distinct shingles
    and hash-joining in memory — no corpus-wide shuffle on shingle. The
    per-doc overlap count is a keyed aggregation over only the *hits*.

    Returns every candidate (non-benchmark) doc with ``n_shared_shingles``
    and ``contaminated`` (0/1 at ``threshold``).
    """
    sh = docs.select(
        F.col(id_col), benchmark_filter.alias("__is_bench"),
        shingles_col(F.col(text_col), n=shingle_n).alias("__sh"),
    )
    # explode_OUTER on both branches is a performance guard, not a
    # semantic choice: plain explode lets InferFiltersFromGenerate derive a
    # size(__sh)>0 predicate that pushdown rewrites in terms of the text
    # column and sinks below the repartition exchange — re-running the full
    # shingle HOF on the (single-partition) pre-shuffle side, serializing
    # the heaviest expression in the query onto one core (measured 10x).
    # The null rows explode_outer keeps are dropped by the inner hash join
    # (null keys never match), post-Generate and for free.
    bench = (
        sh.filter(F.col("__is_bench"))
        .select(F.explode_outer("__sh").alias("shingle"))
        .distinct()
    )
    cand = sh.filter(~F.col("__is_bench"))
    hits = (
        cand.select(F.col(id_col), F.explode_outer("__sh").alias("shingle"))
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        cand.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_shared_shingles"),
            F.when(F.coalesce(F.col("__n"), F.lit(0)) >= threshold, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("contaminated"),
        )
    )


def knn_label_vote(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids: DataFrame | None = None,
    n_probe: int = 4,
) -> DataFrame:
    """k-NN majority-vote classification over an embedding column.

    With ``centroids=None`` composes
    :func:`..operators.similarity.cosine_topk` (broadcast queries, single
    corpus scan) — exact, right when the query set is broadcast-sized.
    Passing a ``centroids`` DataFrame switches the neighbor search to
    :func:`..operators.similarity.ivf_topk` (``n_probe`` lists per query) —
    the scale path once the query set grows, since each query scores only
    ~|corpus|·n_probe/n_centroids vectors instead of the full corpus.

    Either way the vote is the same: neighbor labels counted per query, the
    winner is the most-voted label, ties broken on the smaller label.
    NULL-labeled neighbors are excluded from the vote (they carry no class
    information); the tie-break orders NULLs last for engines where the
    label column is nullable. The vote aggregation shuffles only k rows per
    query.
    """
    queries = embeddings.filter(query_filter)
    if centroids is None:
        top = cosine_topk(embeddings, queries, k=k, id_col=id_col, vec_col=vec_col)
    else:
        top = ivf_topk(
            embeddings,
            queries,
            centroids,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
        )
    labels = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lbl")
    )
    votes = (
        top.join(labels, "neighbor_id")
        .filter(F.col("__lbl").isNotNull())
        .groupBy("query_id", "__lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc_nulls_last("__lbl")
    )
    # integral labels widen to bigint (stable schema for the oracle gate);
    # any other label type — string classes, decimals — is returned AS IS:
    # a hardcoded bigint cast would throw CAST_INVALID_INPUT under ANSI
    # mode (or null every prediction with ANSI off) for 'spam'/'ham'-style
    # labels the tie-break semantics explicitly support
    pred = F.col("__lbl")
    if dict(embeddings.dtypes)[label_col] in ("tinyint", "smallint", "int", "bigint"):
        pred = pred.cast("bigint")
    return (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            "query_id",
            pred.alias("predicted_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


def pack_sequences_report(
    docs: DataFrame,
    token_count_col: Column,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence-packing report (the GPT-style packing a
    pretraining loader applies: concatenate documents in a deterministic
    order, slice into fixed ``seq_len``-token training sequences): per
    group, how many sequences the corpus fills, how much tail padding the
    last one carries, and how many documents straddle a chunk boundary
    (the packing artifact attention masking has to handle).

    All integer arithmetic over a deterministic order (``id_col`` within
    ``group_col``), so the report is exact and oracle-able. One exchange
    keyed by the group (the cumulative-sum window), then a per-group
    aggregation — at scale each group is packed independently, exactly
    like per-source loader shards.
    """
    # null ids pack LAST (ANSI/DuckDB default), tie-broken by length —
    # equal-length ties are interchangeable for every count (r10 find)
    sized = docs.select(
        group_col, id_col, token_count_col.cast("bigint").alias("__len")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.asc_nulls_last(id_col), F.asc("__len"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = sized.withColumn("__cum", F.sum("__len").over(w))
    before = F.col("__cum") - F.col("__len")
    crosses = (
        (F.col("__len") > 0)
        & (F.floor(before / seq_len) != F.floor((F.col("__cum") - 1) / seq_len))
    ).cast("bigint")
    return (
        sized.withColumn("__crosses", crosses)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("__cum").alias("total_tokens"),
            F.ceil(F.max("__cum") / seq_len).cast("bigint").alias("n_sequences"),
            (F.ceil(F.max("__cum") / seq_len) * seq_len - F.max("__cum"))
            .cast("bigint")
            .alias("tail_padding"),
            F.sum("__crosses").alias("n_boundary_docs"),
        )
    )
