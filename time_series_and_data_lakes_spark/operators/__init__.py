from time_series_and_data_lakes_spark.operators.timeseries import (
    align_series,
    create_time_series,
    resample,
    sequence_grid,
    time_bin,
    unnest_time_series,
)
from time_series_and_data_lakes_spark.operators.intervals import range_join
from time_series_and_data_lakes_spark.operators.melt import melt, pivot_measures
from time_series_and_data_lakes_spark.operators.cep import match_error_pattern
from time_series_and_data_lakes_spark.operators.graph import connected_components
from time_series_and_data_lakes_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)
from time_series_and_data_lakes_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucket_pairs,
)

__all__ = [
    "align_series",
    "connected_components",
    "cosine_topk",
    "create_time_series",
    "exact_dedup",
    "ivf_topk",
    "lsh_bucket_pairs",
    "match_error_pattern",
    "melt",
    "minhash_lsh_dedup",
    "pivot_measures",
    "range_join",
    "resample",
    "sequence_grid",
    "simhash_dedup",
    "time_bin",
    "unnest_time_series",
]
