"""CEP operator tests: deterministic cases for the pattern/skip semantics,
plus a property test against the brute-force NFA matcher on random streams
mirroring the reference generator's status distribution
(`random-data-generator/random_data_generator.py:22-28`)."""

from __future__ import annotations

import datetime as dt
import random

from time_series_and_data_lakes_spark.operators.cep import (
    brute_force_matches,
    match_error_pattern,
)

SCHEMA = "sensor_id string, time timestamp, status string, temperature double"


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_error_pattern(df, **kw)
    return sorted(
        (tuple(r) for r in out.collect()),
        key=lambda r: (r[0], r[1]),
    )


def test_simple_match_and_measures(spark):
    rows = [
        ("a", _t(0), "ERROR", 170.0),
        ("a", _t(10), "OK", 50.0),
        ("a", _t(20), "WARNING", 150.0),
        ("a", _t(30), "ERROR", 165.0),
    ]
    (m,) = _run(spark, rows)
    assert m == ("a", _t(0), 2, "OK-WARNING", 50.0, 133.75, 170.0, 30)


def test_within_bound_excludes_slow_match(spark):
    rows = [
        ("a", _t(0), "ERROR", 1.0),
        ("a", _t(30), "OK", 2.0),
        ("a", _t(90), "ERROR", 3.0),  # 90s > WITHIN 60s
    ]
    assert _run(spark, rows) == []


def test_b_count_bounds(spark):
    # zero non-errors between two errors: no match (B{1,5})
    rows = [("a", _t(0), "ERROR", 1.0), ("a", _t(1), "ERROR", 2.0)]
    assert _run(spark, rows) == []
    # six non-errors: no match
    rows = [("a", _t(0), "ERROR", 1.0)]
    rows += [("a", _t(i + 1), "OK", 1.0) for i in range(6)]
    rows += [("a", _t(8), "ERROR", 1.0)]
    assert _run(spark, rows) == []


def test_skip_past_last_row_non_overlap(spark):
    # errors at 0,10,20 with one OK between each: greedy picks (0,10) only —
    # the error at 10 is consumed, so (10,20) must not match.
    rows = [
        ("a", _t(0), "ERROR", 1.0),
        ("a", _t(5), "OK", 1.0),
        ("a", _t(10), "ERROR", 1.0),
        ("a", _t(15), "OK", 1.0),
        ("a", _t(20), "ERROR", 1.0),
    ]
    got = _run(spark, rows)
    assert [m[1] for m in got] == [_t(0)]


def test_failed_attempt_does_not_consume(spark):
    # (e0,e1) invalid (6 Bs) but (e1,e2) valid → match anchored at e1.
    rows = [("a", _t(0), "ERROR", 1.0)]
    rows += [("a", _t(i + 1), "OK", 1.0) for i in range(6)]
    rows += [("a", _t(10), "ERROR", 1.0), ("a", _t(11), "OK", 1.0), ("a", _t(12), "ERROR", 1.0)]
    got = _run(spark, rows)
    assert [m[1] for m in got] == [_t(10)]


def _random_stream(seed: int, n: int, keys: int = 3):
    """Status distribution per the reference generator: temp uniform 10-180;
    >160 ERROR; >140 or 20% chance → WARNING/ERROR coin-flip; else OK."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        key = f"s{rng.randrange(keys)}"
        temp = float(round(10 + rng.random() * 170))
        if temp > 160:
            status = "ERROR"
        elif temp > 140 or rng.random() < 0.2:
            status = rng.choice(["WARNING", "ERROR"])
        else:
            status = "OK"
        rows.append((key, _t(i * 7), status, temp))
    return rows


def test_property_matches_brute_force(spark):
    for seed in range(5):
        rows = _random_stream(seed, 120)
        got = _run(spark, rows)
        want = []
        for key in sorted({r[0] for r in rows}):
            per_key = [(r[1], r[2], r[3]) for r in rows if r[0] == key]
            for m in brute_force_matches(per_key):
                want.append(
                    (
                        key,
                        m["event_time"],
                        m["non_errors"],
                        m["history"],
                        m["min_temperature"],
                        m["avg_temperature"],
                        m["max_temperature"],
                        m["elapsed"],
                    )
                )
        want.sort(key=lambda r: (r[0], r[1]))
        assert got == want, f"seed={seed}"
