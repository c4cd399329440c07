"""Stream-stream interval join — the streaming counterpart of the batch
range join (``operators/intervals.py::range_join``).

The reference's CEP-context pattern (an alert stream joined back to the
raw feed for surrounding readings, `range_join_cep_context`) becomes a
continuous query here: both sides are watermarked, the join condition is an
equi key plus an event-time interval, and Spark keeps BOTH sides' state
only within the watermark horizon — each side can discard a row once the
other side's watermark guarantees no future match (state is
O(rate x watermark), independent of stream length).

At scale the key inside the join condition is what keeps this shuffled on
the equi key (hash exchange both sides, co-partitioned state stores); a
pure time-interval join with no equi key would degenerate to
broadcast-nested-loop state and is refused by Spark for good reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower: str = "INTERVAL 30 SECONDS",
    upper: str = "INTERVAL 30 SECONDS",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where ``right_time`` falls within
    ``[left_time - lower, left_time + upper]``. Both sides are watermarked
    with the same bound so state eviction is symmetric; the interval plus
    the watermark is what lets Spark prove when buffered rows are dead.

    Column-name collisions are the caller's concern (alias before joining);
    ``key`` is emitted once.
    """
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.expr(f"l.{left_time} - {lower}"))
        & (F.col(f"r.{right_time}") <= F.expr(f"l.{left_time} + {upper}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))
