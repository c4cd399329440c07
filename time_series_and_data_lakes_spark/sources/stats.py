"""Metadata-only statistics from parquet file footers.

``ago()``-anchored queries need ``max(time)`` of the events table before they
can filter it. Computing that anchor with an aggregation costs a full extra
scan of the table — harmless at sf0.1, a second pass over ~100 TB at scale.
Parquet footers already carry per-row-group min/max statistics for every
column, so the anchor is answerable from a few KB of footer reads on the
driver, no Spark job at all (VERDICT_r3 hardening item 4).

The helper is deliberately conservative: if ANY row group lacks min/max for
the column, it returns ``None`` and the caller falls back to the scan-based
aggregate — statistics are an optimization, never a correctness dependency.
"""

from __future__ import annotations

import glob
import os


def parquet_footer_max_micros(path: str, column: str) -> int | None:
    """Max of a timestamp ``column`` across all row groups of ``path`` (a
    ``.parquet`` file or a directory of part files), as epoch MICROSECONDS
    of the stored wall-clock value, read from footer statistics only.

    Nanosecond-unit columns are floor-divided to micros — the same
    truncation ``queries.load`` applies to the data itself, so the footer
    max equals ``max()`` of the loaded column exactly. Returns ``None``
    when statistics are missing anywhere (caller must fall back to a scan).
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        paths = [path]
    if not paths:
        return None
    best: int | None = None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        col_idx = None
        for i in range(md.num_columns):
            if md.row_group(0).column(i).path_in_schema == column:
                col_idx = i
                break
        if col_idx is None:
            return None
        for rg in range(md.num_row_groups):
            chunk = md.row_group(rg).column(col_idx)
            stats = chunk.statistics
            if stats is None or not stats.has_min_max:
                return None
            if stats.logical_type.type != "TIMESTAMP":
                return None  # not a timestamp column (or INT96 legacy)
            import json

            unit = json.loads(stats.logical_type.to_json()).get("timeUnit")
            raw = stats.max_raw  # physical INT64: epoch count in `unit`
            if unit == "nanoseconds":
                micros = raw // 1000
            elif unit == "microseconds":
                micros = raw
            elif unit == "milliseconds":
                micros = raw * 1000
            else:
                return None
            best = micros if best is None else max(best, micros)
    return best
