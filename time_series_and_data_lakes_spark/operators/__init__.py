from time_series_and_data_lakes_spark.operators.timeseries import (
    align_series,
    create_time_series,
    resample,
    sequence_grid,
    time_bin,
    unnest_time_series,
)
from time_series_and_data_lakes_spark.operators.melt import melt, pivot_measures

__all__ = [
    "align_series",
    "create_time_series",
    "melt",
    "pivot_measures",
    "resample",
    "sequence_grid",
    "time_bin",
    "unnest_time_series",
]
