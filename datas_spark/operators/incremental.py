"""Incremental aggregate maintenance: keep a grouped rollup current by
merging a small delta instead of recomputing over the full history —
the batch counterpart of the streaming materialized view
(`streaming.materialize_window_counts`).

Works for ALGEBRAIC aggregates — those with a mergeable partial form:
count/sum/min/max directly, mean as (sum, count). At 100 TB this is
the difference between scanning yesterday's petabyte-scale history and
scanning today's delta: partials live in a small state table keyed by
the group, and the merge is a groupBy over |affected groups| rows.

Exactness: sums are computed in DECIMAL so the merged result is
bit-identical to a full recompute (a double sum would differ by
reduction order — the exact failure mode that makes incremental
pipelines drift from their backfills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_rollup", "merge_rollups", "finalize_rollup", "ivm_join_delta"]

_PARTIAL_COLS = ("cnt", "sum_val", "min_val", "max_val")


def partial_rollup(
    df: DataFrame, keys: list[str], value_col: str,
    decimal: str = "decimal(20,4)",
) -> DataFrame:
    """Mergeable partial aggregate of ``value_col`` per ``keys``:
    ``(keys..., cnt, sum_val, min_val, max_val)``. One combinable
    shuffle over the group keys."""
    v = F.col(value_col).cast(decimal)
    return df.groupBy(*keys).agg(
        F.count(v).cast("long").alias("cnt"),
        F.sum(v).alias("sum_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_rollups(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial rollups (history ⊕ delta). Groups touched by
    only one side pass through; shared groups combine exactly. The
    shuffle moves |groups| rows, never the underlying data."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize_rollup(partial: DataFrame) -> DataFrame:
    """Derive the presentation columns (mean) from the partial form;
    keeps the partial columns so the result remains mergeable."""
    return partial.select(
        "*",
        F.round(
            F.col("sum_val").cast("double") / F.col("cnt").cast("double"), 6
        ).alias("avg_val"),
    )


def ivm_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join: the NEW
    result rows a pair of insert-deltas adds to ``a_old ⋈ b_old`` —
    the standard delta-join algebra

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB.

    Append the returned frame to the stored join view and it equals a
    full recompute over (A ∪ ΔA) ⋈ (B ∪ ΔB) — proven in
    ``tests/test_incremental.py``. At 100 TB this is why the nightly
    join view costs |delta| × matching keys, not |history|²: each of
    the three terms joins at least one SMALL side, so the planner
    broadcasts the delta and only the touched key partitions of the
    history are read (pair it with bucketed/partitioned history tables
    to skip the rest at scan time).

    Insert-only (the lakehouse append case). Deletes/updates need
    retraction counts — out of scope here, as for Spark's own
    streaming joins.
    """
    return (
        a_delta.join(b_old, keys)
        .unionByName(a_old.join(b_delta, keys))
        .unionByName(a_delta.join(b_delta, keys))
    )
