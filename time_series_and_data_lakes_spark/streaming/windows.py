"""Event-time windowed aggregation over the stream — the idiomatic upgrade
SURVEY.md §2.8 notes: the reference computes its tumbling windows (``BIN``)
only at query time over the store; Structured Streaming can maintain them
continuously with watermarked event time, tolerating late data the way the
24 h writable memory store does (T11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stats_stream(
    wide: DataFrame,
    window: str = "30 seconds",
    watermark: str = "2 minutes",
    time_col: str = "time",
    key: str = "sensor_id",
    value_col: str = "temperature",
) -> DataFrame:
    """Per-key tumbling event-time stats (the G5/G6 panel aggregates,
    maintained incrementally): count / avg / max per (key, window).

    The watermark bounds state: windows older than the watermark finalize
    and evict, so state size is O(keys x windows-in-watermark) regardless of
    stream length — the streaming analogue of the memory-store retention
    bound (`…stack.py:46-49`).
    """
    return (
        wide.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n_readings"),
            F.avg(value_col).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_readings",
            "avg_value",
            "max_value",
        )
    )


def sliding_stats_stream(
    wide: DataFrame,
    window: str = "1 minute",
    slide: str = "30 seconds",
    watermark: str = "2 minutes",
    time_col: str = "time",
    key: str = "sensor_id",
    value_col: str = "temperature",
) -> DataFrame:
    """Sliding (hopping) event-time windows: each row lands in
    window/slide overlapping windows (Spark expands them map-side), state
    still bounded by the watermark. The streaming form of a moving-average
    dashboard panel."""
    return (
        wide.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window, slide).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n_readings"),
            F.avg(value_col).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_readings",
            "avg_value",
            "max_value",
        )
    )


def session_stats_stream(
    wide: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
    time_col: str = "time",
    key: str = "sensor_id",
    value_col: str = "temperature",
) -> DataFrame:
    """Gap-based session windows (``session_window``): the streaming twin of
    the batch :func:`...operators.sessions.sessionize` — sessions merge as
    rows arrive and finalize once the watermark passes the gap. State per
    key is the open sessions only."""
    return (
        wide.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n_readings"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_readings",
            "min_value",
            "max_value",
        )
    )
