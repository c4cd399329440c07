"""Distributed connected components — near-duplicate pairs to dedup groups.

Pairwise dedup (MinHash/SimHash/n-gram, :mod:`.dedup`) emits edges; turning
edges into *groups* (pick one canonical doc per component, drop the rest) is
a connected-components problem. This implements the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public literature), which converges in
O(log n) rounds and never materializes more than the (shrinking) edge set:

- large-star: every node links its larger neighbors to the minimum of its
  closed neighborhood;
- small-star: every node links its smaller-or-equal neighbors (and itself)
  to that minimum.

Each round is two hash aggregations + two joins on the node key — plain
shuffles that AQE sizes, no driver-side graph state. The driver only
compares one checksum row per round for the fixpoint test, so a 10^11-edge
graph iterates with O(1) driver memory. Lineage is truncated per round
(``localCheckpoint``), keeping plans constant-size across iterations.

The reference has no graph surface (SURVEY.md §2.7 — set ops/graphs absent);
this is a driver-mandated training-data-pipeline extension: dedup *cluster*
assignment at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators.checkpointing import truncate_lineage


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    linked = o.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_links = m.select("u", F.col("m").alias("v"))
    return linked.union(self_links).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node of the (undirected) edge set with its component's
    minimum node id. Returns ``(node, component)``, one row per node that
    appears in ``edges``; ordering of node ids is the column type's natural
    order (lexicographic for string ids).

    ``checkpoint_dir`` switches the per-round lineage truncation from
    ``localCheckpoint`` (executor blocks — fast, but an executor loss
    mid-iteration kills the job) to reliable checkpointing into that
    directory; see :func:`.checkpointing.truncate_lineage`.
    """
    e = truncate_lineage(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        checkpoint_dir,
    )
    prev: tuple | None = None
    for _ in range(max_iter):
        e = truncate_lineage(_small_star(_large_star(e)), checkpoint_dir)
        # order-independent fingerprint of the edge set (edges are distinct,
        # so xor never cancels duplicates); ANSI-safe unlike a long sum
        sig_row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("sig"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["sig"])
        if sig == prev:
            break
        prev = sig
    # converged star edges point node -> component min; representatives
    # (the minima) map to themselves
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("v").alias("v")))
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )
