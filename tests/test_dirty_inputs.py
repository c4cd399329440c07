"""Row-level dirty-input sweep: catalog queries over NULL-injected tables.

Complements test_empty_inputs.py (table-level degeneracy). At corpus scale a
null cell is routine — a failed crawl leaves a document row with NULL text, a
sensor glitch leaves an event row with a NULL measurement or NULL status —
and the contract is that every query still matches its DuckDB oracle on the
SAME nulled parquet, i.e. the engine's null semantics are not merely
"doesn't crash" but bit-for-bit the SQL semantics:

  * a NULL measurement is skipped by aggregates/folds (SQL aggregate rule),
    is "no observation" to melt (a narrow-store record IS a non-null pair),
    and in `resample` is per-column — the row still bounds the other
    series' grid (operators/timeseries.py);
  * a NULL status matches NO pattern variable, so it breaks
    MATCH_RECOGNIZE contiguity (operators/cep.py, streaming twin);
  * a NULL document text is no document: no shingles/signature/quality
    rank, and its media row carries a NULL payload, which every media op
    drops under BOTH error policies (multimodal._row_attempt).

The representative set below covers each of those families with full oracle
parity. The FULL 108-query sweep (every query, parity where an oracle
exists) is gated behind TSDL_DIRTY_SWEEP=1 (~4 min):

    TSDL_DIRTY_SWEEP=1 python -m pytest tests/test_dirty_inputs.py -q
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_matches_oracle

# table -> {column: period}; row i is nulled when i % period == period // 2.
# Prime periods so the null patterns of different columns interleave (rows
# with several simultaneous nulls AND rows with exactly one both occur).
#
# The TPC-H tables are swept too (VERDICT r8 item 2): all three round-8
# cross-engine finds (q13's count(*) vs count(o_orderkey), q21's NULL-suppkey
# numwait, COUNT DISTINCT null-pair semantics) lived in exactly the join-key
# and measure columns below, which previously got zero null coverage.
_INJECT = {
    # r10 (VERDICT r9 item 2): the last un-injected hazard columns. A NULL
    # `ts` is the class of r9's as-of find (NULL times sort FIRST under
    # Spark asc, LAST in DuckDB) and feeds every window/sequence/bin
    # operator; `user_id` is the a1 join key; the nation/region keys are
    # the q5/q7/q8/q9/q21 join spine; `doc_id` is the h64 shard/dedup key
    # (the class of r9's NULL-shard find). `embeddings.embedding` is NOT
    # nulled here — null embeddings raise by design, asserted as a NAMED
    # error in test_null_embeddings_raise_named_error below.
    #
    # r10 closing pass: the final six columns — `event_id` is an ORDER BY
    # ... LIMIT and CEP/sessionize tiebreak key (null sort direction
    # differs across engines inside a LIMIT); `vec_id` is the ANN result
    # id, rank tiebreak, and self-pair guard (`a.vec_id <> q.query_id`);
    # `label` feeds the kNN majority vote; `n_name`/`r_name` are GROUP
    # BY/output keys on the q5/q8/q9 spine; `n_chars` is a quality-score
    # and mixture-weight measure.
    "events": {
        "value": 7,
        "event_type": 19,
        "props": 13,
        "ts": 29,
        "user_id": 31,
        "event_id": 23,
    },
    "documents": {"text": 11, "lang": 17, "source": 23, "doc_id": 19, "n_chars": 29},
    "embeddings": {"vec_id": 11, "label": 17},
    "nation": {"n_nationkey": 7, "n_regionkey": 11, "n_name": 13},
    "region": {"r_regionkey": 5, "r_name": 7},
    "orders": {
        "o_orderkey": 29,
        "o_custkey": 31,
        "o_orderdate": 67,
        "o_orderpriority": 71,
        "o_orderstatus": 73,
        "o_totalprice": 79,
    },
    "lineitem": {
        "l_orderkey": 41,
        "l_suppkey": 37,
        "l_extendedprice": 43,
        "l_discount": 47,
        "l_quantity": 83,
        "l_shipdate": 89,
        "l_returnflag": 97,
        "l_linestatus": 101,
        "l_tax": 103,
        "l_partkey": 127,
        "l_linenumber": 131,
    },
    "customer": {
        "c_custkey": 53,
        "c_mktsegment": 137,
        "c_nationkey": 139,
        "c_acctbal": 149,
        "c_name": 151,
    },
    "supplier": {"s_suppkey": 59, "s_nationkey": 61, "s_acctbal": 67, "s_name": 71},
    "part": {
        "p_partkey": 61,
        "p_brand": 73,
        "p_type": 79,
        "p_name": 83,
        "p_size": 89,
        "p_retailprice": 97,
    },
}


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("dirty_sf")
    for name in sorted(os.listdir(SF_SMOKE)):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(SF_SMOKE, name)
        if os.path.isdir(src):
            parts = [
                os.path.join(src, p)
                for p in sorted(os.listdir(src))
                if p.endswith(".parquet")
            ]
            tb = pa.concat_tables([pq.read_table(p) for p in parts])
        else:
            tb = pq.read_table(src)
        for col, period in _INJECT.get(name[:-8], {}).items():
            i = tb.schema.get_field_index(col)
            arr = tb.column(col).combine_chunks()
            mask = pa.array((np.arange(tb.num_rows) % period) == (period // 2))
            nulled = pa.compute.if_else(mask, pa.nulls(tb.num_rows, arr.type), arr)
            tb = tb.set_column(i, tb.schema.field(i), nulled)
        pq.write_table(tb, str(dst / name))
    return str(dst)


# One query per null-semantics family changed for this contract; each is a
# FULL oracle-parity gate over the nulled tables, not a smoke count.
REPRESENTATIVE = [
    "f2_cep_match_recognize",  # null status breaks contiguity; null temps in match aggs
    "q1_flagship_interpolate",  # per-column IGNORE-NULLS lerp/LOCF endpoints
    "q1_sql_flagship",  # SQL twin: lead IGNORE NULLS forward endpoints
    "g2_measure_series",  # melt drops null measures
    "g4_status_counts",  # null event_type is its own GROUP BY key
    "analytics_ewma",  # sequential fold skips null measurements
    "pipe_quality_deciles",  # null text never enters the decile window
    "dedup_simhash",  # null text -> no signature -> no candidates
    "multimodal_decode_stats",  # null text -> NULL payload -> row dropped
    "text_winnow_fingerprint",  # null text -> no fingerprints
    # the round-8/round-9 TPC-H null finds, pinned ungated on the nulled
    # tables (full parity for the rest is the gated 108-query sweep):
    "tpch_q13_order_count_distribution",  # + r9: GROUP BY c_custkey null merge
    "tpch_q21_sole_late_suppliers",  # three-valued NOT EXISTS on null suppkey
    "melt_narrow",  # r9: oracle mirrors melt's null-measure drop
    "tpch_q1_pricing_summary",  # r9: exact-decimal sums, decimal-space round
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_representative_queries_match_oracle_on_dirty_tables(
    spark, dirty_sf, name
):
    sql = entry.oracle_sql()[name]
    assert_matches_oracle(entry.queries()[name](spark, dirty_sf), dirty_sf, sql, name)


def test_tie_and_null_boundaries_match_oracle(spark, tmp_path):
    """Adversarial ordering fixture the periodic null injection cannot
    produce: duplicate per-key timestamps whose tied rows differ in value,
    including a NULL tied with a real reading at the window boundary.
    Pins two cross-engine hazards found by review: g9's min_by struct
    comparator sorts the null field FIRST while the oracle's ORDER BY is
    NULLS LAST (open flipped between NULL and the value), and
    analytics_moving_window ordered by time alone, leaving every
    tie-spanning frame sum nondeterministic."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for sensor in (1, 2):
        for k, (off, vals) in enumerate(
            {
                0: [None, 10.0 * sensor],       # null ties a real reading
                3600: [5.0, 9.0],               # two real readings tie
                7200: [7.5],                    # lone reading
                10800: [None, 2.0, 2.0],        # exact duplicate + null
            }.items()
        ):
            for v in vals:
                rows.append(
                    (eid, t0 + dt.timedelta(seconds=off), sensor, "ok", v, "{}")
                )
                eid += 1
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "ties")
    os.makedirs(sf)
    # single parquet FILE (the driver's layout; DuckDB reads it directly)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    for name in ("g9_ohlc_per_sensor", "analytics_moving_window"):
        assert_matches_oracle(
            entry.queries()[name](spark, sf), sf, entry.oracle_sql()[name], name
        )
    # semantics, not just parity: the boundary null does not null the open
    got = {
        r["sensor_id"]: (r["open"], r["close"], r["n_obs"])
        for r in entry.queries()["g9_ohlc_per_sensor"](spark, sf).collect()
    }
    assert got[1] == (10.0, 2.0, 8) and got[2] == (20.0, 2.0, 8)


def test_null_id_order_boundaries_match_oracle(spark, tmp_path):
    """Adversarial NULL-id ordering fixture for the two order-SENSITIVE
    uses of `event_id` the periodic injection cannot reliably fire: the
    CEP tiebreak (two B rows tied on `ts`, one with NULL event_id — the
    tie order is exported through the `history` string) and the
    `ORDER BY event_id LIMIT` cut in a2 (NULL ids land inside the LIMIT
    window on whichever side the engine sorts them). Pins the engine
    convention: a NULL id sorts LAST (the knn tie-break's
    `asc_nulls_last`, DuckDB's ASC default)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # sensor 1: A=error, two B rows TIED at t0+10s (one NULL id), C=error
        (100, t0, 1, "error", 50.0),
        (2, t0 + dt.timedelta(seconds=10), 1, "ok", 10.0),
        (None, t0 + dt.timedelta(seconds=10), 1, "warn", 20.0),
        (101, t0 + dt.timedelta(seconds=20), 1, "error", 60.0),
    ]
    # 12 joinable rows for the LIMIT-10 cut, 3 with NULL event_id
    for i in range(12):
        rows.append(
            (None if i % 4 == 0 else 200 + i, t0 + dt.timedelta(hours=1 + i), 2, "ok", float(i))
        )
    sf = str(tmp_path / "nullid")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["cust1", "cust2"], pa.string()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
                "c_acctbal": pa.array([1.0, 2.0], pa.float64()),
                "c_mktsegment": pa.array(["SEG", "SEG"], pa.string()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    for name in ("f3_cep_event_time", "a2_enrichment_view"):
        assert_matches_oracle(
            entry.queries()[name](spark, sf), sf, entry.oracle_sql()[name], name
        )
    # semantics, not just parity: the NULL-id B row sorts LAST in the tie
    got = entry.queries()["f3_cep_event_time"](spark, sf).collect()
    assert [r["history"] for r in got if r["sensor_id"] == 1] == ["ok-warn"]


def test_null_group_key_at_limit_cut_matches_oracle(spark, tmp_path):
    """The LIMIT-cut face of the null-id convention: a DESC-measure TIE
    whose ASC tiebreak key is a NULL group key sitting exactly at the
    LIMIT boundary. Spark's plain asc sorts the NULL group FIRST (into
    the top-k), DuckDB's default sorts it LAST (out) — runtime-confirmed
    on g6 before the asc_nulls_last fix (engine returned the NULL sensor
    in the top-10, oracle returned sensor 10). The same fix class covers
    q21 (integer numwait ties x nullable s_name), q2, bm25/RRF doc_id."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    # 12 sensor groups (one NULL), every max_temperature tied at 50.0
    rows = [(i, t0, (None if i == 0 else i), "ok", 50.0, "{}") for i in range(12)]
    sf = str(tmp_path / "cut")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    name = "g6_top_sensors_recent_max"
    assert_matches_oracle(
        entry.queries()[name](spark, sf), sf, entry.oracle_sql()[name], name
    )
    got = entry.queries()[name](spark, sf).collect()
    assert sorted(r["sensor_id"] for r in got) == list(range(1, 11))  # no NULL


def test_all_null_time_column_matches_oracle(spark, tmp_path):
    """Whole-column degeneracy for the timeline: every `ts` is NULL (rows
    exist, but the column carries no values). Parquet footers then have no
    min/max for ts, so the ago() anchor helper returns None and `_anchored`
    falls back to its aggregate pre-scan — whose max(ts) is NULL, making
    `ts >= NULL - interval` drop every row, exactly the oracle's correlated
    `max(ts)` subquery semantics. Pins both the conservative footer-stats
    fallback and the NULL-anchor SQL semantics on anchored + resample +
    ordered-feed queries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 24
    sf = str(tmp_path / "nullts")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.nulls(n, pa.timestamp("us")),
                "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
                "event_type": pa.array(["ok"] * n, pa.string()),
                "value": pa.array([float(i) for i in range(n)], pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    from time_series_and_data_lakes_spark.sources.stats import (
        parquet_footer_max_micros,
    )

    assert parquet_footer_max_micros(f"{sf}/events.parquet", "ts") is None
    for name in (
        "g6_top_sensors_recent_max",  # footer anchor -> None -> pre-scan
        "q1_flagship_interpolate",  # resample: no timeline positions at all
        "g3_raw_feed_ordered",  # plain ordered feed keeps the rows
    ):
        assert_matches_oracle(
            entry.queries()[name](spark, sf), sf, entry.oracle_sql()[name], name
        )


@pytest.fixture(scope="module")
def null_embedding_sf(tmp_path_factory):
    # embeddings.embedding is deliberately NOT in _INJECT: vector ops raise
    # by design on NULL vectors, so the contract is a NAMED error, not
    # oracle parity. Only embeddings is nulled here — the other tables are
    # symlinked clean so the queries' non-vector inputs stay green.
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("null_emb_sf")
    for name in sorted(os.listdir(SF_SMOKE)):
        if not name.endswith(".parquet") or name == "embeddings.parquet":
            continue
        os.symlink(os.path.join(SF_SMOKE, name), str(dst / name))
    tb = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    i = tb.schema.get_field_index("embedding")
    arr = tb.column("embedding").combine_chunks()
    mask = pa.array((np.arange(tb.num_rows) % 13) == 6)
    nulled = pa.compute.if_else(mask, pa.nulls(tb.num_rows, arr.type), arr)
    tb = tb.set_column(i, tb.schema.field(i), nulled)
    pq.write_table(tb, str(dst / "embeddings.parquet"))
    return str(dst)


@pytest.mark.parametrize(
    "name",
    [
        "ann_cosine_topk",
        "ann_ivf_topk",
        "ann_ivf_kmeans_topk",
        "ann_lsh_dup_pairs",
        "ann_pq_adc_topk",
        "ann_quantize_int8",
        "pipe_semdedup",
        "pipe_knn_label_vote",
        "pipe_knn_label_vote_ivf",
    ],
)
def test_null_embeddings_raise_named_error(spark, null_embedding_sf, name):
    # collect(), not count(): count() lets Catalyst prune a pure projection
    # down to the scan, never evaluating the guarded expression (the
    # quantize shape) — exactly how a silent-null regression would hide.
    with pytest.raises(Exception) as exc:
        entry.queries()[name](spark, null_embedding_sf).collect()
    assert "null embedding" in str(exc.value), (
        f"{name}: expected the named null-embedding error, got "
        f"{type(exc.value).__name__}: {str(exc.value)[:200]}"
    )


@pytest.mark.skipif(
    not os.environ.get("TSDL_DIRTY_SWEEP"),
    reason="set TSDL_DIRTY_SWEEP=1 for the full 108-query dirty-input sweep",
)
def test_full_catalog_dirty_sweep(spark, dirty_sf):
    oracles = entry.oracle_sql()
    failures = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, dirty_sf)
            sql = oracles.get(name)
            if sql is None:  # approximate-by-design: rows-only check
                df.count()
            else:
                assert_matches_oracle(df, dirty_sf, sql, name)
        except AssertionError as e:
            failures[name] = str(e).splitlines()[0][:200]
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    assert not failures, failures
