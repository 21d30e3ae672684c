"""Feature-encoding operators for training-set assembly: leakage-safe
categorical target encoding and robust (median/IQR) scaling.

Reference parity: the reference's scorer family (SURVEY §2.2) appends
per-row numeric features the downstream selector consumes; these are
the two standard encodings a tabular training pipeline adds on top —
absent from the reference, present in every feature-engineering stack,
and first-class here because both are pure relational plans.

Scale shape (both operators): ONE combinable groupBy on the key column
(category / group) producing a tiny stats frame, joined back to the
fact rows — AQE broadcasts the stats side whenever cardinality is
small, and the encode itself is a map-side expression. No windows, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["loo_target_encode", "robust_scale"]


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str = "te",
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward the
    global prior:

        te = (sum_cat − y + m·prior) / (cnt_cat − 1 + m)

    Each row's own target is subtracted from its category's sum before
    averaging — the standard leakage guard, so the encoding of a row
    never contains that row's label. Singleton categories fall back to
    the prior exactly ((m·prior)/m). Rows with a NULL target do not
    contribute to any sum and receive the non-LOO encoding
    (sum_cat + m·prior)/(cnt_cat + m); NULL categories form their own
    group (groupBy keeps NULL keys, and the join re-attaches them
    null-safely).

    Sums/counts are computed only over non-NULL targets; the join back
    is on the category key alone, so the stats frame stays at category
    cardinality.
    """
    m = float(smoothing)
    prior = df.agg(F.avg(target_col).alias("__prior"))
    stats = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.sum(target_col).alias("__sum"),
        F.count(target_col).alias("__cnt"),
    )
    y = F.col(target_col)
    loo = (F.col("__sum") - y + m * F.col("__prior")) / (
        F.col("__cnt") - 1 + F.lit(m)
    )
    blind = (F.coalesce(F.col("__sum"), F.lit(0.0)) + m * F.col("__prior")) / (
        F.coalesce(F.col("__cnt"), F.lit(0)) + F.lit(m)
    )
    return (
        df.join(F.broadcast(prior))
        .join(stats, F.col(cat_col).eqNullSafe(F.col("__cat")), "left")
        .withColumn(out_col, F.when(y.isNotNull(), loo).otherwise(blind))
        .drop("__cat", "__sum", "__cnt", "__prior")
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    by: str | list[str] | None = None,
    out_col: str = "scaled",
) -> DataFrame:
    """Robust scaling: ``(x − median) / (p75 − p25)`` per group (or
    globally when ``by`` is None) — the outlier-resistant alternative
    to z-scoring, computed with exact linear-interpolation percentiles
    (``F.percentile``, same interpolation as numpy/DuckDB, SURVEY §7
    'hard parts' #1).

    Degenerate groups (IQR = 0, e.g. a constant group) yield NULL
    rather than ±inf; NULL values pass through with a NULL scale. At
    100 TB swap ``F.percentile`` for ``approx_percentile`` with a
    documented tolerance — the plan shape (grouped agg + join back +
    map-side arithmetic) is unchanged.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col)
    aggs = [
        F.percentile(v, F.lit(0.5)).alias("__med"),
        F.percentile(v, F.lit(0.25)).alias("__p25"),
        F.percentile(v, F.lit(0.75)).alias("__p75"),
    ]
    if keys:
        stats = df.groupBy(*[F.col(k).alias(f"__k_{k}") for k in keys]).agg(*aggs)
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
            cond = c if cond is None else (cond & c)
        joined = df.join(stats, cond, "left").drop(*[f"__k_{k}" for k in keys])
    else:
        joined = df.join(F.broadcast(df.agg(*aggs)))
    iqr = F.col("__p75") - F.col("__p25")
    return joined.withColumn(
        out_col, F.when(iqr > 0, (v - F.col("__med")) / iqr)
    ).drop("__med", "__p25", "__p75")
