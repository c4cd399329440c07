"""Wide↔narrow reshaping: the Timestream storage-model operators.

- melt (wide→narrow, A12): what the reference Lambda does to every record
  (`cdk/load_data_fn/app.py:54-67`) — one output row per (record, measure),
  dimensions repeated, measure as (measure_name, measure_value_double).
- pivot (narrow→wide, A10): the conditional-aggregate pivot the Grafana CEP
  panel runs (`grafana-dashboard/...json:121`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    dims: Sequence[str],
    measures: Sequence[str],
    time_col: str | None = None,
    measure_name_col: str = "measure_name",
    measure_value_col: str = "measure_value_double",
) -> DataFrame:
    """Melt wide rows into the narrow store shape.

    ``stack``-based (single project, no shuffle, stays in codegen): each input
    row yields ``len(measures)`` narrow rows sharing the dimension set, per
    the Lambda's dimension/measure whitelists (`app.py:56,60`). Measures are
    cast to double — the reference hard-codes ``MeasureValueType='DOUBLE'``
    (`app.py:27`).

    Column names are escaped into the ``stack`` SQL (backticks doubled in
    identifiers, quotes doubled in the measure-name literal) — this is the
    package's one string-SQL construction, and an unescaped ``o'clock``
    measure would break the literal (or inject an expression) where every
    ``F.col`` path would not.
    """
    ident = lambda c: c.replace("`", "``")  # noqa: E731
    slit = lambda c: c.replace("'", "''")  # noqa: E731
    stack_args = ", ".join(
        f"'{slit(m)}', CAST(`{ident(m)}` AS DOUBLE)" for m in measures
    )
    stack_expr = (
        f"stack({len(measures)}, {stack_args}) "
        f"AS (`{ident(measure_name_col)}`, `{ident(measure_value_col)}`)"
    )
    cols = ([time_col] if time_col else []) + list(dims)
    return df.selectExpr(*[f"`{ident(c)}`" for c in cols], stack_expr).filter(
        F.col(measure_value_col).isNotNull()
    )


def pivot_measures(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
    measure_name_col: str = "measure_name",
    measure_value_col: str = "measure_value_double",
) -> DataFrame:
    """Narrow→wide: ``MAX(CASE WHEN measure_name='x' THEN measure_value END)``
    per measure (`grafana…json:121`), as one hash aggregate.

    The explicit ``max(when(...))`` form (not ``.pivot()``) keeps the measure
    list static so the plan is a single pass with map-side partial
    aggregation — no second job to discover pivot values.
    """
    aggs = [
        F.max(
            F.when(F.col(measure_name_col) == m, F.col(measure_value_col))
        ).alias(m)
        for m in measures
    ]
    return df.groupBy(*group_cols).agg(*aggs)
