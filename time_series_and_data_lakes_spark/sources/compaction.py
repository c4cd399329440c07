"""Small-file compaction for partitioned stores (the OPTIMIZE verb).

Micro-batch ingest writes one file per task per trigger, so a streaming
store accumulates thousands of KB-sized files per partition — and at scale,
file-count (not byte-count) starts to dominate planning and open() cost.
Compaction rewrites chosen partitions into few large files, in place, and
leaves every other partition byte-untouched:

- The subset to compact is selected by predicate (partition pruning applies
  — untouched partitions are never read).
- The subset is materialized through
  :func:`..operators.checkpointing.truncate_lineage` BEFORE the overwrite:
  this both survives the rewrite of its own input files and (with
  ``checkpoint_dir=``) makes the compaction executor-loss-safe on a real
  cluster.
- The write uses dynamic partition overwrite, so only partitions present in
  the subset are replaced; the store stays readable throughout for
  snapshot-isolation-free parquet (Delta/Iceberg make this transactional —
  same call shape, swap the writer).

Repartitioning by the partition columns lands each partition value in one
task → exactly one output file per partition (the compaction goal). A
``files_per_partition`` knob adds a content-hash salt for partitions too
large for a single file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators.checkpointing import truncate_lineage
from time_series_and_data_lakes_spark.sources.merge import dynamic_partition_overwrite

def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    predicate: Column | None = None,
    files_per_partition: int = 1,
    checkpoint_dir: str | None = None,
) -> int:
    """Rewrite the partitions of ``path`` selected by ``predicate`` into
    ``files_per_partition`` files each. Returns the number of rows
    rewritten. Idempotent: re-running produces the same layout."""
    if files_per_partition < 1:
        # unvalidated, 0 is a mid-job ANSI DIVIDE_BY_ZERO from the salt modulo
        raise ValueError(f"files_per_partition must be >= 1, got {files_per_partition}")
    store = spark.read.parquet(path)
    subset = store.filter(predicate) if predicate is not None else store
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition == 1:
        packed = subset.repartition(*keys)
    else:
        # pmod, not abs(h) % n: ANSI abs(Long.MIN_VALUE) throws
        # ARITHMETIC_OVERFLOW (r10 find, runtime-confirmed)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in subset.columns]),
            F.lit(files_per_partition),
        )
        packed = subset.repartition(*keys, salt)
    # Materialize before overwriting the files the plan reads from — and
    # truncate lineage so the writer sees an RDD root, not the file source.
    packed = truncate_lineage(packed, checkpoint_dir)
    n = packed.count()
    if n == 0:
        return 0  # nothing selected: leave the store untouched
    with dynamic_partition_overwrite(spark):
        (
            packed.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    return n
