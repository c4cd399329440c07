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


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and return a plan-root replacement for it.

    ``eager=False`` (r10 optimization) defers block materialization to the
    caller's NEXT action instead of running a dedicated job per call: the
    logical plan is truncated immediately either way (a LogicalRDD replaces
    the subtree, so per-round analysis cost stays constant — the property
    iterative callers need), but an iteration that immediately runs its own
    action (the connected-components fixpoint collect, the k-means
    next-round broadcast build) folds the checkpoint job into that action —
    halving the driver job round trips per round. Use eager only when no
    action follows promptly (blocks would otherwise materialize at an
    unpredictable later point). The job-folding applies to
    ``localCheckpoint`` ONLY: a lazy reliable ``checkpoint`` still runs a
    dedicated checkpoint-write job after the first action and RECOMPUTES
    the (un-cached) lineage to write it — every round would compute twice
    (ADVICE r10) — so reliable mode pins ``eager=True`` below regardless
    of the argument.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-memory blocks);
    a directory → reliable ``checkpoint`` into it. The SparkContext keeps
    one checkpoint root per application: it is set from ``checkpoint_dir``
    only when no root is set yet (each ``setCheckpointDir`` call would mint
    a fresh UUID subdirectory — calling it per iteration would scatter the
    run across directories), and an already-configured root wins over the
    argument.

    Reliable checkpoints persist in the store until cleaned: an iterative
    caller accumulates one dataset-sized checkpoint per iteration. Spark's
    own cleanup mechanism covers this — launch long jobs with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (a
    startup-time conf) and superseded iterations are deleted as their RDDs
    go out of scope; otherwise clear the directory after the job."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(checkpoint_dir)
    # eager pinned True: see docstring — lazy reliable checkpoints recompute
    # their lineage in the deferred checkpoint-write job, doubling each
    # round's work instead of saving a barrier.
    return df.checkpoint(eager=True)
