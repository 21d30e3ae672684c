"""Time-series regularization: resample irregular per-key observations
onto a fixed grid with linear interpolation (forward/backward fill at
the edges) — the gap-fill primitive behind feature windows, charting,
and any model that wants evenly-spaced inputs. Spark has no native
resampler; this composes one from a sequence explode and two per-key
windows.

Scale shape: the grid generates map-side (`sequence` + `explode` per
key — no driver loop), and the interpolation state comes from two
frame-bounded window passes (last-non-null backward, first-non-null
forward) PARTITIONED BY KEY — per-key local sorts, never a global one.
Positions are exact integer microseconds since a fixed epoch (timezone-
free), so the per-row interpolation arithmetic reproduces bit-for-bit
in the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_interpolate", "lag_features"]


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    start: str,
    end: str,
    step_seconds: int,
    epoch: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Resample ``value_col`` onto the closed-open grid ``[start, end)``
    at ``step_seconds`` for every key present in ``df``:
    ``(key_col, grid_us bigint, value double)`` with ``grid_us``
    microseconds since ``epoch``.

    Grid values linearly interpolate between the nearest observations;
    before the first / after the last observation they forward- or
    backward-fill; keys with no observation in range yield NULLs.
    An observation exactly on a grid point wins (no self-interpolation
    drift).
    """
    if step_seconds < 1:
        raise ValueError("step_seconds must be >= 1")
    pos_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{epoch}', {ts_col})"
    ).cast("long")
    lo = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{epoch}', TIMESTAMP_NTZ '{start}')"
    ).cast("long")
    hi = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{epoch}', TIMESTAMP_NTZ '{end}')"
    ).cast("long")
    step = F.lit(int(step_seconds) * 1_000_000).cast("long")

    keys = df.select(F.col(key_col)).distinct()
    grid = keys.select(
        key_col,
        F.explode(F.sequence(lo, hi - F.lit(1), step)).alias("pos"),
    ).select(
        key_col, "pos", F.lit(None).cast("double").alias("v"), F.lit(1).alias("g")
    )
    obs = (
        df.where((pos_us >= lo) & (pos_us < hi))
        .select(
            F.col(key_col),
            pos_us.alias("pos"),
            F.col(value_col).cast("double").alias("v"),
            F.lit(0).alias("g"),
        )
    )
    u = grid.unionByName(obs)
    back = (
        Window.partitionBy(key_col)
        .orderBy(F.asc("pos"), F.asc("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.asc("pos"), F.asc("g"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_pos = F.when(F.col("v").isNotNull(), F.col("pos"))
    u = u.select(
        key_col,
        "pos",
        "g",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_pos, ignorenulls=True).over(back).alias("pp"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_pos, ignorenulls=True).over(fwd).alias("np"),
    )
    interp = (
        F.when(F.col("pp") == F.col("np"), F.col("pv"))
        .when(
            F.col("pp").isNotNull() & F.col("np").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("pos") - F.col("pp")).cast("double")
            / (F.col("np") - F.col("pp")).cast("double"),
        )
        .when(F.col("pp").isNotNull(), F.col("pv"))
        .when(F.col("np").isNotNull(), F.col("nv"))
    )
    return (
        u.where(F.col("g") == 1)
        .select(
            key_col,
            F.col("pos").alias("grid_us"),
            F.round(interp, 6).alias("value"),
        )
    )


def lag_features(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: list[int] | None = None,
    rolling_windows: list[int] | None = None,
) -> DataFrame:
    """Generic supervised-learning featurizer over an ordered per-key
    series: appends ``lag_<n>`` (value n steps back) and
    ``roll<w>_sum`` / ``roll<w>_mean`` (trailing w rows EXCLUDING the
    current one — the leakage-safe convention: a feature computed for
    step t may only see strictly-prior steps).

    One exchange on the key, all windows share the same (key, order)
    sort — Catalyst reuses the exchange and sort across every feature
    column. ``order_col`` must be unique per key for deterministic
    output. Rolling means are NULL until the window has at least one
    prior row.
    """
    lags = lags if lags is not None else [1]
    rolling_windows = rolling_windows if rolling_windows is not None else []
    base = Window.partitionBy(key_col).orderBy(order_col)
    out = df
    for n in lags:
        out = out.withColumn(f"lag_{n}", F.lag(value_col, n).over(base))
    for w in rolling_windows:
        frame = base.rowsBetween(-w, -1)
        out = out.withColumn(
            f"roll{w}_sum", F.sum(value_col).over(frame)
        ).withColumn(f"roll{w}_mean", F.avg(value_col).over(frame))
    return out
