"""Resampling: interpolation math, edge fill, exact-hit, empty key."""

import datetime as dt

import pytest

from datas_spark.operators.timeseries import resample_interpolate


def _row(k, minute, v):
    return (k, dt.datetime(2024, 1, 1, 1, minute), float(v))


def test_resample_linear_and_edges(spark):
    # key 1: obs at 01:10 -> 10.0 and 01:50 -> 50.0; hourly... use 20-min grid
    df = spark.createDataFrame(
        [_row(1, 10, 10.0), _row(1, 50, 50.0)],
        "k: long, ts: timestamp, v: double",
    )
    out = {
        r["grid_us"]: r["value"]
        for r in resample_interpolate(
            df, "k", "ts", "v",
            start="2024-01-01 01:00:00", end="2024-01-01 02:00:00",
            step_seconds=1200, epoch="2024-01-01 00:00:00",
        ).collect()
    }
    M = 60 * 1_000_000
    assert out[60 * M] == 10.0          # 01:00 backfills the first obs
    assert out[80 * M] == 20.0          # 01:20 between 10@01:10 and 50@01:50
    assert out[100 * M] == 40.0         # 01:40
    # no 01:60 grid point (closed-open range ends at 02:00 exclusive)
    assert len(out) == 3


def test_resample_exact_hit_and_ffill(spark):
    df = spark.createDataFrame(
        [_row(2, 0, 7.0)], "k: long, ts: timestamp, v: double"
    )
    out = [
        r["value"]
        for r in resample_interpolate(
            df, "k", "ts", "v",
            start="2024-01-01 01:00:00", end="2024-01-01 01:40:00",
            step_seconds=1200, epoch="2024-01-01 00:00:00",
        ).orderBy("grid_us").collect()
    ]
    assert out == [7.0, 7.0]  # exact grid hit at 01:00, ffill at 01:20


def test_resample_key_without_obs_yields_nulls(spark):
    df = spark.createDataFrame(
        [_row(1, 10, 5.0), (3, dt.datetime(2023, 6, 1), 99.0)],
        "k: long, ts: timestamp, v: double",
    )
    out = resample_interpolate(
        df, "k", "ts", "v",
        start="2024-01-01 01:00:00", end="2024-01-01 01:20:00",
        step_seconds=1200, epoch="2024-01-01 00:00:00",
    ).collect()
    vals = {r["k"]: r["value"] for r in out}
    assert vals[1] == 5.0
    assert vals[3] is None  # key exists, no obs in range

    with pytest.raises(ValueError):
        resample_interpolate(df, "k", "ts", "v", start="a", end="b", step_seconds=0)
