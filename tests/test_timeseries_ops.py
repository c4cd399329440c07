"""Unit tests for the time-series operator edge cases SURVEY.md §7 flags:
single-observation keys, grid points exactly on observations (including the
final one), varchar LOCF, and bin boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from time_series_and_data_lakes_spark.operators import resample, sequence_grid, time_bin


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "sensor_id string, time timestamp, temperature double, status string"
    )


def test_resample_exact_hits_and_midpoints(spark):
    df = _obs(spark, [("a", _ts(0), 10.0, "OK"), ("a", _ts(10), 20.0, "ERROR")])
    out = {
        r["time"]: (r["temperature"], r["status"])
        for r in resample(
            df,
            ["sensor_id"],
            step="INTERVAL 5 SECONDS",
            linear={"temperature": "temperature"},
            locf={"status": "status"},
        ).collect()
    }
    assert out[_ts(0)] == (10.0, "OK")
    assert out[_ts(5)] == (15.0, "OK")
    # final grid point lands exactly on the last observation
    assert out[_ts(10)] == (20.0, "ERROR")


def test_resample_single_observation_key(spark):
    df = _obs(spark, [("b", _ts(5), 99.0, "OK")])
    rows = resample(
        df,
        ["sensor_id"],
        step="INTERVAL 1 SECOND",
        linear={"temperature": "temperature"},
        locf={"status": "status"},
    ).collect()
    assert len(rows) == 1
    assert rows[0]["temperature"] == 99.0
    assert rows[0]["status"] == "OK"


def test_resample_locf_only_varchar(spark):
    df = _obs(spark, [("a", _ts(0), 1.0, "OK"), ("a", _ts(9), 2.0, "ERROR")])
    out = resample(df, ["sensor_id"], step="INTERVAL 3 SECONDS", locf={"status": "status"})
    got = [r["status"] for r in out.orderBy("time").collect()]
    assert got == ["OK", "OK", "OK", "ERROR"]  # 0,3,6,9


def test_resample_identity_when_grid_equals_observations(spark):
    df = _obs(spark, [("a", _ts(i), float(i), "OK") for i in range(5)])
    out = resample(
        df, ["sensor_id"], step="INTERVAL 1 SECOND", linear={"temperature": "temperature"}
    )
    got = [(r["time"], r["temperature"]) for r in out.orderBy("time").collect()]
    assert got == [(_ts(i), float(i)) for i in range(5)]


def test_sequence_grid_counts_and_bounds(spark):
    df = _obs(spark, [("a", _ts(0), 0.0, "OK"), ("a", _ts(10), 1.0, "OK")])
    grid = sequence_grid(df, ["sensor_id"], step="INTERVAL 4 SECONDS").collect()
    assert [r["time"] for r in sorted(grid, key=lambda r: r["time"])] == [
        _ts(0),
        _ts(4),
        _ts(8),
    ]  # stop bound inclusive only on exact hit


def test_time_bin_floors_to_epoch_multiple(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1, 0, 0, 37),)], "t timestamp")
    got = df.select(time_bin("t", "30 seconds").alias("b")).collect()[0]["b"]
    assert got == dt.datetime(2024, 1, 1, 0, 0, 30)
