"""Scalar helpers mirroring the reference's SQL surface (SURVEY.md §2.9).

``ago``/``now`` are Timestream built-ins (`timestream-queries/queries.txt:11`,
`grafana-dashboard/...json:518`). For deterministic testing, both accept an
``anchor`` column standing in for the wall clock (the test harness anchors at
``max(time)`` of the fixture so results are replayable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators.timeseries import time_bin

__all__ = ["ago", "now", "time_bin", "grafana_macros"]


def now(anchor: Column | None = None) -> Column:
    """``now()`` — current wall clock, or a deterministic anchor."""
    return anchor if anchor is not None else F.current_timestamp()


def ago(interval: str, anchor: Column | None = None) -> Column:
    """``ago('15 minutes')`` ≡ now() - interval (`queries.txt:11,31,40`)."""
    iv = interval.strip()
    if not iv.upper().startswith("INTERVAL"):
        iv = f"INTERVAL {iv}"
    return now(anchor) - F.expr(iv)


def grafana_macros(sql: str, start: str, finish: str, interval_ms: int, measure: str) -> str:
    """Substitute the Grafana template macros the dashboard queries use
    (`grafana…json:121,203,285,337,392,614`): ``$__timeFilter`` →
    time BETWEEN bounds, ``$__interval_ms`` → panel interval,
    ``$__measure`` → selected measure name.

    The values land inside SQL string literals that ``spark.sql`` then
    executes, so embedded quotes are doubled (SQL-standard escaping) —
    a measure named ``o'clock``, or a template value fed from a request
    parameter, must not break the literal or inject a predicate."""
    q = lambda s: s.replace("'", "''")  # noqa: E731
    return (
        sql.replace(
            "$__timeFilter",
            f"time BETWEEN TIMESTAMP '{q(start)}' AND TIMESTAMP '{q(finish)}'",
        )
        .replace("$__interval_ms", str(int(interval_ms)))
        .replace("$__measure", f"'{q(measure)}'")
    )
