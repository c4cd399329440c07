"""Driver-gate registry contract.

The external correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` against ``oracle_sql()`` at sf0.01. These tests
pin the rotation invariants so a future registry edit can't silently push a
never-driver-verified query out of the checked window (the round-2 failure
mode: 22 queries appended past entry 50 had no driver row at all).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from time_series_and_data_lakes_spark import queries as Q

# Queries with FEWER THAN TWO driver-green CORRECTNESS rows through round 3
# (audited against CORRECTNESS_r01/r02/r03 in round 4 — the round-3 tail
# comment wrongly claimed r01 greens for the events-based entries that hit
# the round-1 loader bug). Every name here MUST sit inside the 50-entry
# window until it banks its second green round.
UNDER_VERIFIED = {
    # green only in round 2 (errored in round 1 under the events-loader bug):
    "q2_interpolated_series",
    "q3_timeseries_roundtrip",
    "g2_measure_series",
    "g3_raw_feed_ordered",
    "g4_status_counts",
    "g4b_status_case_pivot",
    "g5_binned_percentiles",
    "g6_top_sensors_recent_max",
    "g7_per_sensor_interval_max",
    "rollup_cascade_stats",
    "json_props_extract",
    "analytics_moving_window",
    "gap_report_sensors",
    # green only in round 3 (added to the window in rounds 2-3):
    "text_winnow_fingerprint",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_lsh_dup_pairs",
    "ann_quantize_int8",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_resize",
    "tpch_q7_nation_volume",
    "tpch_q13_order_count_distribution",
    "tpch_q15_top_supplier_revenue",
    "tpch_q16_supplier_count",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_sole_late_suppliers",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q17_small_quantity_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_parts",
    "tpch_q12_priority_by_status",
    "tpch_q20_excess_share_suppliers",
    "pipe_split_train_test",
    "pipe_sample_per_source",
    "pipe_token_budget",
    "pipe_decontaminate",
    "pipe_knn_label_vote",
    "pipe_knn_label_vote_ivf",
    "pipe_mix_weights",
    "pipe_quality_funnel",
    # added round 4 (no driver row yet):
    "multimodal_resize_pixels",
    "ann_pq_adc_topk",
    "text_bm25_topk",
}


def test_unverified_queries_inside_driver_window():
    window = list(entrymod.queries())[:50]
    missing = UNDER_VERIFIED - set(window)
    assert not missing, f"not in driver window: {sorted(missing)}"


def test_tail_holds_only_multiround_green_or_approximate():
    # Rotation policy: the tail may contain only entries driver-green in >=2
    # rounds, or the approximate-by-design pair that can never have an oracle
    # row. UNDER_VERIFIED entries must never be rotated out.
    overlap = set(Q._DRIVER_TAIL) & UNDER_VERIFIED
    assert not overlap, f"under-verified queries rotated out: {sorted(overlap)}"


def test_no_oracle_queries_rotated_out_of_window():
    # The two approximate-by-design queries have no oracle; keeping them in
    # the tail lets the 50-entry window be 50/50 oracle-green.
    window = list(entrymod.queries())[:50]
    assert "g5b_approx_percentiles" not in window
    assert "approx_distinct_parts" not in window


def test_rotation_drops_nothing():
    assert set(Q._rotate_tail(dict(Q.QUERIES))) == set(Q.QUERIES)
    # every tail key still exists in the registry
    missing = [k for k in Q._DRIVER_TAIL if k not in Q.QUERIES]
    assert not missing, missing


def test_every_oracle_key_has_query():
    assert set(Q.ORACLES) <= set(Q.QUERIES)
    # every query is oracle-backed except the documented approximate ones and
    # genuinely non-SQL-expressible ops
    no_oracle = set(Q.QUERIES) - set(Q.ORACLES)
    assert no_oracle <= {"g5b_approx_percentiles", "approx_distinct_parts"}
