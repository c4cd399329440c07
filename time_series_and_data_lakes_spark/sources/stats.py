"""Metadata-only statistics from parquet file footers.

``ago()``-anchored queries need ``max(time)`` of the events table before they
can filter it. Computing that anchor with an aggregation costs a full extra
scan of the table — harmless at sf0.1, a second pass over ~100 TB at scale.
Parquet footers already carry per-row-group min/max statistics for every
column, so the anchor is answerable from a few KB of footer reads on the
driver, no Spark job at all (VERDICT_r3 hardening item 4).

The helper is deliberately conservative: statistics are an optimization,
never a correctness dependency. Missing min/max anywhere, a corrupt or
unreadable part file, a missing pyarrow — anything unexpected returns
``None`` and the caller falls back to the scan-based aggregate.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def parquet_footer_max_micros(path: str, column: str) -> int | None:
    """Max of a timestamp ``column`` across all row groups of ``path`` (a
    ``.parquet`` file or a directory of part files), as epoch MICROSECONDS
    of the stored wall-clock value, read from footer statistics only.

    Nanosecond-unit columns are truncated toward zero to micros — the same
    direction as the ``ts div 1000`` conversion ``queries.load`` applies to
    the data itself (Spark's ``div`` truncates, Python's ``//`` floors; the
    two differ on pre-1970 values), so the footer max equals ``max()`` of
    the loaded column exactly. Returns ``None`` on any surprise — missing
    statistics, non-timestamp column, unreadable file — never raises.
    """
    try:
        if os.path.isdir(path):
            # recursive: a PARTITIONED store has no top-level part files,
            # and falling back to the aggregate pre-scan there would cost
            # the full extra pass this helper exists to avoid (footers of
            # every part file still carry the column's min/max)
            paths = sorted(
                os.path.join(root, f)
                for root, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        else:
            paths = [path]
        if not paths:
            return None
        best: int | None = None
        saw_stats = False
        for p in paths:
            md = pq.ParquetFile(p).metadata
            if md.num_row_groups == 0:
                continue  # empty part file (Spark writes these): no rows
            col_idx = None
            for i in range(md.num_columns):
                if md.row_group(0).column(i).path_in_schema == column:
                    col_idx = i
                    break
            if col_idx is None:
                return None
            for rg in range(md.num_row_groups):
                chunk = md.row_group(rg).column(col_idx)
                if chunk.num_values == 0:
                    continue
                stats = chunk.statistics
                if stats is None or not stats.has_min_max:
                    return None
                if stats.logical_type.type != "TIMESTAMP":
                    return None  # not a timestamp column (or INT96 legacy)
                unit = json.loads(stats.logical_type.to_json()).get("timeUnit")
                raw = stats.max_raw  # physical INT64: epoch count in `unit`
                if unit == "nanoseconds":
                    # truncate toward zero, matching Spark's `div`
                    micros = raw // 1000 if raw >= 0 else -((-raw) // 1000)
                elif unit == "microseconds":
                    micros = raw
                elif unit == "milliseconds":
                    micros = raw * 1000
                else:
                    return None
                saw_stats = True
                best = micros if best is None else max(best, micros)
        return best if saw_stats else None
    except Exception:
        return None
