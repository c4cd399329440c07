"""Connected components (large-star/small-star): unit correctness on known
graph shapes + a brute-force property check on random graphs."""

from __future__ import annotations

import random

from time_series_and_data_lakes_spark.operators.graph import connected_components


def _labels(spark, edges, max_iter=25):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r["node"], r["component"])
        for r in connected_components(df, max_iter=max_iter).collect()
    }


def test_chain_collapses_to_min(spark):
    got = _labels(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a")}


def test_cycle_and_separate_component(spark):
    got = _labels(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_direction_and_duplicates_ignored(spark):
    got = _labels(spark, [("b", "a"), ("a", "b"), ("a", "b"), ("c", "b")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


def test_unconverged_iteration_budget_raises_not_returns_wrong_labels(spark):
    # exhausting max_iter without a CONFIRMED fixpoint must raise — an
    # un-converged star set silently merges/splits dedup clusters.
    # (Confirmation needs the fingerprint to repeat, so even a trivially
    # converged input raises at max_iter=1: the contract is "confirmed in
    # budget", and the error says to raise the budget.)
    import pytest

    long_chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge.*max_iter=1"):
        _labels(spark, long_chain, max_iter=1)
    # the default budget converges and labels the whole chain
    got = _labels(spark, long_chain)
    assert got == {(f"n{i:02d}", "n00") for i in range(31)}


def _brute_components(edges):
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, out = set(), {}
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for nb in adj[n]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        rep = min(comp)
        for n in comp:
            out[n] = rep
    return set(out.items())


def test_property_random_graphs_match_brute_force(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = [f"n{i:03d}" for i in range(40)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(30 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _labels(spark, edges) == _brute_components(edges), trial


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    # VERDICT_r3 hardening: checkpoint_dir= switches lineage truncation to
    # the reliable store (df.checkpoint); labels must be identical to the
    # default localCheckpoint mode, and checkpoint files must actually land.
    import os

    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p2"), ("p2", "q")]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = sorted(map(tuple, connected_components(df).collect()))
    ckpt = str(tmp_path / "cc_ckpt")
    reliable = sorted(
        map(tuple, connected_components(df, checkpoint_dir=ckpt).collect())
    )
    assert reliable == local
    # the checkpoint root is app-global and set-once: when an earlier test
    # in the session already set it (e.g. kmeans with checkpoint_dir=), the
    # files land under THAT root, not this test's tmp_path — walk the real
    # root so the assertion is order-independent (r11: failed under an
    # ad-hoc test ordering that ran test_llm_ops first)
    root = spark.sparkContext.getCheckpointDir() or ckpt
    root = root.removeprefix("file:")
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(root) for f in fs
    ]
    assert written, "reliable mode wrote no checkpoint files"


def test_label_propagation_ties_prefer_real_labels_over_null(spark):
    # tie-break is nulls-LAST (the SQL oracle's `ORDER BY votes DESC,
    # label` and the kNN convention) — F.asc's nulls-first default would
    # hand a tied node the NULL label
    from pyspark.sql import functions as F  # noqa: F401

    from time_series_and_data_lakes_spark.operators.graph import label_propagation

    edges = [("s1", "n"), ("s2", "n")]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [("s1", None), ("s2", "spam")], "node string, label string"
    )
    (row,) = label_propagation(e, seeds, iters=1).collect()
    assert (row["node"], row["label"], row["votes"]) == ("n", "spam", 1)


def test_label_propagation_matches_python_reference(spark):
    # Synchronous unweighted LP on a random graph vs a brute-force Python
    # implementation of the same update rule (majority of neighbors'
    # current labels, ties -> smallest label, seeds clamped).
    import random

    from time_series_and_data_lakes_spark.operators.graph import label_propagation

    rng = random.Random(13)
    n = 40
    edges = sorted(
        {
            (a, b)
            for _ in range(120)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    directed = edges + [(b, a) for a, b in edges]
    seeds = {v: v % 3 for v in range(0, n, 4)}

    iters = 3
    labels = dict(seeds)
    new: dict[int, tuple[int, int]] = {}
    for _ in range(iters):
        votes: dict[int, dict[int, int]] = {}
        for s, d in directed:
            if s in labels:
                votes.setdefault(d, {}).setdefault(labels[s], 0)
                votes[d][labels[s]] += 1
        new = {
            node: min(
                ((c, lab) for lab, c in by_lab.items()),
                key=lambda t: (-t[0], t[1]),
            )[::-1]
            for node, by_lab in votes.items()
        }
        labels = dict(seeds)
        labels.update({v: lab for v, (lab, c) in new.items() if v not in seeds})
    want = {
        (v, lab, c) for v, (lab, c) in new.items() if v not in seeds
    }

    e_df = spark.createDataFrame(directed, "src bigint, dst bigint")
    s_df = spark.createDataFrame(list(seeds.items()), "node bigint, label bigint")
    got = {
        (r["node"], r["label"], r["votes"])
        for r in label_propagation(e_df, s_df, iters=iters).collect()
    }
    assert got == want


def test_assume_distinct_is_optimization_only_identical_on_messy_edges(spark):
    # r11: assume_distinct=True skips the ingress dedup exchange. It must be
    # a pure optimization, NEVER a semantics switch: the first _large_star
    # round ends in its own distinct and drops self-loops via the v > u
    # filter, so even a WRONG caller (duplicates, flips, self-loops) gets
    # the identical component labeling.
    messy = [
        ("a", "b"), ("a", "b"), ("b", "a"),      # duplicates + a flip
        ("c", "c"),                               # self-loop
        ("b", "c"), ("x", "y"), ("y", "x"),
    ]
    df = spark.createDataFrame(messy, "src string, dst string")
    base = sorted(map(tuple, connected_components(df).collect()))
    fast = sorted(
        map(tuple, connected_components(df, assume_distinct=True).collect())
    )
    assert fast == base
    assert base  # non-degenerate fixture


def test_large_star_output_invariants(spark):
    # ADVICE r10: _small_star(normalized=True) silently depends on
    # _large_star emitting distinct, non-self, strictly u > v rows. Pin the
    # invariant at the operator level so a future edit to _large_star (e.g.
    # relaxing v > u to >=) trips here instead of corrupting components.
    from time_series_and_data_lakes_spark.operators.graph import _large_star

    messy = [
        ("a", "b"), ("b", "a"), ("a", "b"),      # flips + duplicates
        ("c", "c"),                               # self-loop
        ("b", "c"), ("x", "y"), ("m", "a"),
    ]
    df = spark.createDataFrame(messy, "src string, dst string").selectExpr(
        "src AS u", "dst AS v"
    )
    rows = [(r["u"], r["v"]) for r in _large_star(df).collect()]
    assert rows, "non-degenerate fixture"
    assert all(u > v for u, v in rows), rows        # strict orientation
    assert len(rows) == len(set(rows)), rows        # distinctness
