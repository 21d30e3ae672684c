"""Resampling: interpolation math, edge fill, exact-hit, empty key."""

import datetime as dt

import pytest

from datas_spark.operators.timeseries import lag_features, resample_interpolate


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


# --- Kaplan–Meier churn curve (batch 67) --------------------------------

def test_churn_survival_hand_computed(spark, tmp_path):
    # synthesize an events parquet dir: 4 users, durations 0,1,1,2 days;
    # the duration-2 user is censored (last event on/after Jan 28)
    from datetime import datetime as dt
    rows = [
        (1, dt(2024, 1, 1), "u1"),                       # dur 0, churned
        (2, dt(2024, 1, 1), "u2"), (3, dt(2024, 1, 2), "u2"),   # dur 1, churned
        (4, dt(2024, 1, 3), "u3"), (5, dt(2024, 1, 4), "u3"),   # dur 1, churned
        (6, dt(2024, 1, 26), "u4"), (7, dt(2024, 1, 28), "u4"), # dur 2, censored
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    df.write.parquet(str(tmp_path / "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        pass  # only events is read by this query
    from datas_spark.registry_events import q_churn_survival_curve

    out = {r.t: r for r in q_churn_survival_curve(spark, str(tmp_path)).collect()}
    # day 0: risk 4, d 1 → S = 3/4
    assert out[0].n_risk == 4 and out[0].d == 1
    assert out[0].survival == pytest.approx(0.75, abs=1e-6)
    # day 1: risk 3, d 2 → S = 0.75 * 1/3 = 0.25
    assert out[1].survival == pytest.approx(0.25, abs=1e-6)
    # day 2: censored only, d 0 → survival carries at 0.25
    assert out[2].d == 0 and out[2].survival == pytest.approx(0.25, abs=1e-6)


def test_lag_features_hand_example(spark):
    rows = [("u", i, float(10 * i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {
        r.t: r
        for r in lag_features(
            df, "k", "t", "v", lags=[1, 2], rolling_windows=[3]
        ).collect()
    }
    assert out[1].lag_1 is None and out[1].roll3_sum is None
    assert out[3].lag_1 == 20.0 and out[3].lag_2 == 10.0
    # trailing 3 EXCLUDING current: t=5 sees {20,30,40}
    assert out[5].roll3_sum == 90.0 and out[5].roll3_mean == 30.0
    # leakage check: current value never in its own rolling window
    assert out[2].roll3_sum == 10.0
