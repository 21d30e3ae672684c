"""Temporal and interval join operators — north-star extensions
(SURVEY §2.9). Spark has no native AS-OF or interval join; the naive
encodings (range-predicate theta join → BroadcastNestedLoop, or
per-row subquery) are cross-product scans that die at scale. These
implementations reduce both to the shuffle/sort machinery Spark is
already good at.

- ``asof_join``: point-in-time "latest right row at or before each
  left row" per key — the enrichment join of event pipelines (attach
  the most recent model score / price / config to every observation).
  Encoded as ONE union + ONE per-key ordered window pass:
  both sides shuffle once on the key (same cost as any sort-merge
  join), the window's running ``last(payload, ignorenulls)`` carries
  the newest right payload forward to each left row. No range scan,
  no per-row lookup, no cross product. DuckDB's native ASOF JOIN is
  the oracle.

- ``interval_join``: point-in-interval join (value BETWEEN lo AND hi)
  for when BOTH sides are too big to broadcast. Right intervals are
  replicated into fixed-width buckets (``explode(sequence(...))``),
  points probe their single bucket by equi-join, and the exact
  BETWEEN predicate filters inside the bucket — an equi-join Spark
  shuffles/AQEs normally, never a nested-loop. Replication factor =
  interval_width / bucket_width + 1; pick ``bucket_width`` near the
  median interval width. (If one side IS broadcast-small, skip this
  and write the plain theta join — a broadcast nested loop over a
  tiny side is the right plan.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the right row with the same ``key``
    and the greatest ``right_ts <= left_ts`` (backward as-of, inclusive
    on equal timestamps). Left rows with no prior right row keep NULL
    right columns (left-outer semantics).

    Output: all left columns, plus every non-key right column renamed
    ``right_prefix + name`` (including ``right_ts`` — the match's own
    timestamp, so staleness is measurable downstream).

    Plan shape: union the two sides as (key, ts, tag, payload) rows,
    ONE hash shuffle on ``key``, ONE in-partition sort on
    ``(ts, tag)`` (right tag 0 sorts before left tag 1 at equal ts —
    that is what makes the match inclusive), then a running
    ``last(payload, ignorenulls=True)`` window. Identical movement to
    a sort-merge join of the same two frames. A pathologically hot key
    sorts one big partition — the standard salt-by-ts-range upgrade
    applies if one key dominates.
    """
    rcols = [c for c in right.columns if c != key]
    lcols = left.columns
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in rcols]).alias("__p"),
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    u = l.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType)).unionByName(
        r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
        F.col("__src") == 1
    )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}").alias(right_prefix + c) for c in rcols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of left points to right intervals with
    ``lo_col <= left_val <= hi_col``, as a bucketed equi-join (the
    big-big case; broadcast the small side yourself when one fits).

    Every point lands in exactly one bucket and every interval is
    replicated to each bucket it overlaps, so a matching (point,
    interval) pair meets in exactly one bucket — no post-join dedup.
    The equi-join on the bucket id goes through the normal shuffle
    hash/sort-merge path (AQE handles skewed buckets); the BETWEEN
    predicate evaluates only within co-bucketed candidates.
    """
    bw = float(bucket_width)
    if bw <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    lb = left.withColumn("__b", F.floor(F.col(left_val) / F.lit(bw)).cast("long"))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bw)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bw)).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "__b")
        .where((F.col(left_val) >= F.col(lo_col)) & (F.col(left_val) <= F.col(hi_col)))
        .drop("__b")
    )
