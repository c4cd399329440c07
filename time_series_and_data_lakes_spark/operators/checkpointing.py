"""Lineage truncation for iterative operators (connected components, k-means).

Iterative DataFrame programs must cut the logical plan every round or analysis/
codegen cost grows superlinearly with iterations. Two ways to cut it:

- ``localCheckpoint`` (default): materializes blocks on the executors —
  fastest, no distributed-store round trip, but the blocks die with an
  executor, so a node loss mid-iteration fails the job. Right for local
  mode and for short interactive jobs.
- reliable ``checkpoint`` into ``checkpoint_dir``: writes the blocks to the
  reliable store (HDFS/S3 on a cluster, any shared dir locally) so the job
  survives executor loss — the posture a 1000-executor, hours-long run
  wants, at the price of one reliable-store write per iteration.

VERDICT_r3 hardening item 3: both call sites default to local and accept
``checkpoint_dir=`` to opt into the reliable path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and return a plan-root replacement for it.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-memory blocks);
    a directory → reliable ``checkpoint`` into it. The directory is set on
    the SparkContext (Spark keeps one checkpoint root per context; each
    ``setCheckpointDir`` call makes a fresh UUID subdirectory, so repeated
    calls never collide)."""
    if checkpoint_dir is None:
        return df.localCheckpoint()
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint()
