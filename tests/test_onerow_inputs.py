"""Cardinality-degeneracy sweep: every catalog query over ONE-ROW tables.

The third axis of the degeneracy map, between test_empty_inputs.py (zero
rows) and test_dirty_inputs.py (null cells): exactly one observation per
table. At 100 TB this is routine per-GROUP — a sensor that reported once, a
tenant with a single document, a partition prune leaving one row — and it is
where single-observation statistics live: sample variance needs n>=2, Holt
needs two points to seed a trend, LTTB needs three to form a triangle,
k-means/PQ train on fewer rows than centroids/codes, and every join finds no
partner. The contract mirrors the dirty sweep, not the empty one: full
DuckDB-oracle parity on the SAME one-row parquet wherever an oracle exists
(a rows-only count elsewhere), with a descriptive ValueError /
NotImplementedError allowed only for models that genuinely cannot exist at
this cardinality (the empty sweep's boundary contract).

The representative subset below runs ungated; the FULL 108-query sweep
shares the table-level-degeneracy gate:

    TSDL_EMPTY_SWEEP=1 python -m pytest tests/test_onerow_inputs.py -q
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_matches_oracle


@pytest.fixture(scope="module")
def onerow_sf(tmp_path_factory):
    """First row of every test table, flat-file layout (the driver's)."""
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("onerow_sf")
    for name in sorted(os.listdir(SF_SMOKE)):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(SF_SMOKE, name)
        if os.path.isdir(src):
            part = next(p for p in sorted(os.listdir(src)) if p.endswith(".parquet"))
            src = os.path.join(src, part)
        pq.write_table(pq.read_table(src).slice(0, 1), str(dst / name))
    return str(dst)


# One query per single-observation-statistics family; each is a FULL
# oracle-parity gate over the one-row tables.
REPRESENTATIVE = [
    "q1_flagship_interpolate",  # 1-point grid: lerp has no right endpoint
    "analytics_holt",  # trend seed needs two observations
    "analytics_lttb_downsample",  # triangle needs three points
    "analytics_ewma",  # fold seeds from the lone point
    "g9_ohlc_per_sensor",  # open == close == the one reading
    "sessionize_events",  # a lone reading is a 1-event session
    "dedup_components",  # a single node is its own component
    "pipe_quality_deciles",  # ntile(10) over one document
    # NOT pipe_mix_weights: with a single document only one source exists,
    # and the op's documented boundary is a descriptive ValueError when a
    # weighted source has zero rows (the full sweep asserts exactly that).
    "dedup_minhash_eval",  # recall/precision over ZERO ground-truth pairs
    "tpch_q17_small_quantity_revenue",  # ungrouped aggregate, 1-row frame
    "tpch_q13_order_count_distribution",  # 1 customer x 1 order
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_representative_queries_match_oracle_on_onerow_tables(
    spark, onerow_sf, name
):
    sql = entry.oracle_sql()[name]
    assert_matches_oracle(entry.queries()[name](spark, onerow_sf), onerow_sf, sql, name)


@pytest.mark.skipif(
    not os.environ.get("TSDL_EMPTY_SWEEP"),
    reason="set TSDL_EMPTY_SWEEP=1 for the full 108-query one-row sweep",
)
def test_full_catalog_onerow_sweep(spark, onerow_sf):
    oracles = entry.oracle_sql()
    failures = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, onerow_sf)
            sql = oracles.get(name)
            if sql is None:  # approximate-by-design: rows-only check
                df.count()
            else:
                assert_matches_oracle(df, onerow_sf, sql, name)
        except (ValueError, NotImplementedError) as e:
            if not str(e):  # descriptive-message contract
                failures[name] = f"empty {type(e).__name__} message"
        except AssertionError as e:
            failures[name] = str(e).splitlines()[0][:200]
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    assert not failures, failures
