"""Driver-gate registry contract.

The external correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` against ``oracle_sql()`` at sf0.01. These tests
pin the rotation invariants so a future registry edit can't silently push a
never-driver-verified query out of the checked window (the round-2 failure
mode: 22 queries appended past entry 50 had no driver row at all).

Green counts are derived from the driver's own ``CORRECTNESS_r*.json`` rows
at the repo root — never from a hand-maintained set. (The round-3 tail
comment mis-claimed greens for 13 entries; the round-4 UNDER_VERIFIED set
then silently exempted 24 brand-new queries. Both failure modes are
un-writable now: a query with <2 driver-green rows that is outside the
window fails ``test_under_verified_queries_inside_driver_window`` no matter
what any comment or set claims.)
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entrymod
from time_series_and_data_lakes_spark import queries as Q

REPO = Path(__file__).resolve().parent.parent

# Approximate-by-design: no exact oracle row can ever exist (APPROX_PERCENTILE
# / APPROX_COUNT_DISTINCT sketches). Error-bounded by property tests
# (tests/test_properties.py, tests/test_approx_bounds.py) with exact
# driver-green twins (g5_binned_percentiles, distinct_part_suppliers); a
# driver row for these would be weaker than the checks they already carry.
APPROXIMATE_BY_DESIGN = {"g5b_approx_percentiles", "approx_distinct_parts"}

# Explicitly-parked overflow: catalog entries with <2 greens allowed outside
# the window, each mapped to the round whose driver check it must be inside
# the window FOR. A parked entry stops being exempt as soon as the upcoming
# round reaches its deadline (strictly-greater test below — deadline round
# N means "in the window when check N runs", not "park through check N").
# Empty means every under-verified query occupies a window slot right now.
PARKED: dict[str, int] = {}


def _next_round() -> int:
    # CORRECTNESS files arrive one per completed round; the upcoming
    # driver check is round N+1.
    return len(list(REPO.glob("CORRECTNESS_r*.json"))) + 1


def _actively_parked() -> set[str]:
    nxt = _next_round()
    return {name for name, by_round in PARKED.items() if by_round > nxt}


def _driver_green_counts() -> dict[str, int]:
    """Rounds each query was driver-green, from CORRECTNESS_r*.json."""
    counts: dict[str, int] = {}
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert files, "no CORRECTNESS_r*.json at repo root"
    for f in files:
        for name, row in json.loads(f.read_text()).items():
            ok = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                # hash_match is None for rows-only (no-oracle) checks
                and row.get("hash_match") in (True, None)
            )
            if ok:
                counts[name] = counts.get(name, 0) + 1
    return counts


# The 19-query core reference surface (SURVEY §2's always-checked heart):
# flagship q1-q3, Grafana panels g1-g10 incl. g4b and the CEP pivot g1, the
# Athena join a1, CEP f2/f3, melt.
CORE19 = [
    "q1_flagship_interpolate", "q1_sql_flagship", "q2_interpolated_series",
    "q3_timeseries_roundtrip", "g1_cep_pivot_by_bin", "g2_measure_series",
    "g3_raw_feed_ordered", "g4_status_counts", "g4b_status_case_pivot",
    "g5_binned_percentiles", "g6_top_sensors_recent_max",
    "g7_per_sensor_interval_max", "g8_heatmap_bins", "g9_ohlc_per_sensor",
    "g10_error_rate_by_bin", "a1_enrichment_join", "f2_cep_match_recognize",
    "f3_cep_event_time", "melt_narrow",
]


def test_changed_queries_lead_the_window():
    # Standing rule (VERDICT_r9 "What's wrong #1"): any query whose program,
    # oracle, or operator dependency changed in round N must be in round
    # N+1's window — a banked green only attests the code that earned it.
    # _DRIVER_LEAD declares last round's changed set; it must be a prefix of
    # the checked window so the re-verification cannot be rotated away.
    window = list(entrymod.queries())[:50]
    assert window[: len(Q._DRIVER_LEAD)] == Q._DRIVER_LEAD


def test_round10_window_composition():
    # VERDICT_r9 item 1, pinned verbatim: the round-10 window = the seven
    # round-9-changed queries (+ any in-round additions to _DRIVER_LEAD,
    # e.g. a2's r10 null-id fix) + the 19-query core + the stalest-green
    # tail entries filling the window (lowest banked green count, then
    # alphabetical), computed from the FROZEN r01-r09 driver records so
    # the pin stays stable once CORRECTNESS_r10 lands.
    counts: dict[str, int] = {}
    for i in range(1, 10):
        f = REPO / f"CORRECTNESS_r{i:02d}.json"
        for name, row in json.loads(f.read_text()).items():
            ok = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") in (True, None)
            )
            if ok:
                counts[name] = counts.get(name, 0) + 1
    fixed = set(Q._DRIVER_LEAD) | set(CORE19)
    cands = sorted(
        (k for k in Q.QUERIES if k not in fixed and k not in APPROXIMATE_BY_DESIGN),
        key=lambda k: (counts.get(k, 0), k),
    )
    expected = set(Q._DRIVER_LEAD) | set(CORE19) | set(cands[: 50 - len(fixed)])
    window = set(list(entrymod.queries())[:50])
    assert window == expected, (
        f"missing={sorted(expected - window)} extra={sorted(window - expected)}"
    )


def test_under_verified_queries_inside_driver_window():
    # Rotation policy: every query with fewer than two driver-green rounds
    # sits inside the 50-entry window until it banks its second green.
    green = _driver_green_counts()
    window = set(list(entrymod.queries())[:50])
    parked = _actively_parked()
    violations = [
        name
        for name in entrymod.queries()
        if green.get(name, 0) < 2
        and name not in window
        and name not in APPROXIMATE_BY_DESIGN
        and name not in parked
    ]
    assert not violations, f"under-verified queries outside window: {violations}"


def test_tail_holds_only_multiround_green_or_approximate():
    green = _driver_green_counts()
    parked = _actively_parked()
    bad = [
        name
        for name in Q._DRIVER_TAIL
        if green.get(name, 0) < 2
        and name not in APPROXIMATE_BY_DESIGN
        and name not in parked
    ]
    assert not bad, f"tail entries without 2x driver-green: {bad}"


def test_parked_entries_exist_and_deadlines_future():
    # A parked name must be a real catalog entry, and a deadline at or
    # before the upcoming round exempts nothing (the window tests above
    # use _actively_parked) — it should be deleted, not left behind.
    stale = [n for n, by in PARKED.items() if by <= _next_round()]
    assert not stale, f"parked deadlines reached — move into window and unpark: {stale}"
    unknown = [n for n in PARKED if n not in Q.QUERIES]
    assert not unknown, f"parked names not in catalog: {unknown}"


def test_no_oracle_queries_rotated_out_of_window():
    # The two approximate-by-design queries have no oracle; keeping them in
    # the tail lets the 50-entry window be 50/50 oracle-green.
    window = list(entrymod.queries())[:50]
    assert not APPROXIMATE_BY_DESIGN & set(window)


def test_rotation_drops_nothing():
    assert set(Q._rotate_tail(dict(Q.QUERIES))) == set(Q.QUERIES)
    # every lead/tail key still exists in the registry, and no key is both
    missing = [k for k in Q._DRIVER_TAIL + Q._DRIVER_LEAD if k not in Q.QUERIES]
    assert not missing, missing
    assert not set(Q._DRIVER_LEAD) & set(Q._DRIVER_TAIL)


def test_every_oracle_key_has_query():
    assert set(Q.ORACLES) <= set(Q.QUERIES)
    # every query is oracle-backed except the documented approximate ones and
    # genuinely non-SQL-expressible ops
    no_oracle = set(Q.QUERIES) - set(Q.ORACLES)
    assert no_oracle <= APPROXIMATE_BY_DESIGN
