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
  the oracle. ``salt_buckets`` activates the hot-key upgrade: rows
  salt into timestamp-range buckets so one dominant key spreads over
  ``salt_buckets`` tasks; a tiny per-(key, bucket) carry-in frame
  (the latest right row from earlier buckets) preserves exact as-of
  semantics.

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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["asof_join", "interval_join", "salted_equi_join"]

_ASOF_RESERVED = ("__k", "__ts", "__src", "__p", "__l", "__m", "__bkt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    salt_buckets: int | None = None,
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
    ``(ts, tag, payload)`` (right tag 0 sorts before left tag 1 at
    equal ts — that is what makes the match inclusive), then a running
    ``last(payload, ignorenulls=True)`` window. Identical movement to
    a sort-merge join of the same two frames.

    Ties among right rows sharing the same (key, ts) resolve
    deterministically: the payload struct itself is the final sort
    key, so the GREATEST payload (field-by-field struct comparison)
    wins on every run and engine. (DuckDB's ASOF leaves the duplicate
    choice unspecified; a stable rule on our side at least guarantees
    run-to-run reproducibility — requires the right payload columns to
    be orderable types.)

    ``salt_buckets=N`` enables hot-key salting: both sides bucket into
    N equal timestamp ranges (bounds from one lazy broadcast min/max
    aggregate — no eager action), the union shuffles on
    (key, bucket) so a pathological key spreads over N tasks, and
    exact semantics are preserved by injecting into every left bucket
    a carry-in row — the latest right row from all earlier buckets,
    computed on a tiny (keys × buckets) frame. Cost: two extra small
    aggregates; the data itself still shuffles once.
    """
    rcols = [c for c in right.columns if c != key]
    lcols = left.columns
    if not rcols:
        raise ValueError("right frame must have at least one non-key column")
    for c in (*lcols, key, *rcols):
        if c in _ASOF_RESERVED:
            raise ValueError(f"column name {c!r} collides with asof_join internals")
    clash = set(lcols) & {right_prefix + c for c in rcols}
    if clash:
        raise ValueError(
            f"prefixed right columns collide with left columns: {sorted(clash)}"
        )
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
    lf = l.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    rf = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    u = lf.unionByName(rf)
    order = [
        F.col("__ts").asc(),
        F.col("__src").asc(),
        F.col("__p").asc_nulls_first(),
    ]
    if salt_buckets is None:
        w = (
            Window.partitionBy("__k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
            F.col("__src") == 1
        )
    else:
        matched = _asof_salted(lf, rf, u, int(salt_buckets), order)
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}").alias(right_prefix + c) for c in rcols],
    )


def _asof_salted(l: DataFrame, r: DataFrame, u: DataFrame, nb: int, order) -> DataFrame:
    """Salted window pass: bucket by timestamp range, carry the latest
    earlier-bucket right row into each left bucket, window per
    (key, bucket). All bounds and carries stay in ONE lazy plan."""
    if nb < 2:
        raise ValueError(f"salt_buckets must be >= 2, got {nb}")
    from pyspark.sql.types import TimestampNTZType, TimestampType

    def ts_num() -> F.Column:
        # numeric view of the timestamp for range bucketing; timestamp
        # types go through an epoch-seconds cast (NTZ can't cast to
        # double directly)
        c = F.col("__ts")
        if isinstance(u.schema["__ts"].dataType, (TimestampType, TimestampNTZType)):
            c = c.cast("timestamp")
        return c.cast("double")

    # lazy global ts bounds: 1-row aggregate broadcast-crossJoined in
    bounds = u.agg(F.min(ts_num()).alias("__mn"), F.max(ts_num()).alias("__mx"))

    def bucketed(df: DataFrame) -> DataFrame:
        span = F.greatest(F.col("__mx") - F.col("__mn"), F.lit(1e-12))
        b = F.floor((ts_num() - F.col("__mn")) / span * F.lit(nb)).cast("long")
        # NULL timestamps go to bucket 0 explicitly: they sort first in
        # the lowest bucket's window, matching the unsalted path's
        # asc_nulls_first order. (Without this, least(NULL, nb-1) skips
        # the NULL and lands them in the LAST bucket, where the carry-in
        # would hand them the latest right payload instead of NULL.)
        bkt = F.when(F.col("__ts").isNull(), F.lit(0)).otherwise(
            F.least(b, F.lit(nb - 1))
        )
        return (
            df.crossJoin(broadcast(bounds))
            .withColumn("__bkt", bkt)
            .drop("__mn", "__mx")
        )
    lb, rb = bucketed(l), bucketed(r)
    # latest right row per (key, bucket): max(struct(ts, payload)) — the
    # same (ts, payload) total order as the window tie-break; map-side
    # combinable, no window over the hot key's raw rows
    r_latest = rb.groupBy("__k", "__bkt").agg(
        F.max(F.struct(F.col("__ts"), F.col("__p"))).alias("__lat")
    )
    # carry for every (key, bucket) PRESENT on the left: latest __lat
    # among strictly earlier buckets. The grid frame is <= keys × nb
    # rows — the per-key window here sorts <= nb rows, never the data.
    l_buckets = lb.select("__k", "__bkt").distinct()
    grid = l_buckets.join(r_latest, ["__k", "__bkt"], "full_outer")
    wc = (
        Window.partitionBy("__k")
        .orderBy(F.col("__bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        grid.withColumn("__carry", F.last("__lat", ignorenulls=True).over(wc))
        .join(l_buckets, ["__k", "__bkt"], "left_semi")
        .where(F.col("__carry").isNotNull())
        .select(
            "__k",
            F.col("__carry.__ts").alias("__ts"),
            F.lit(0).alias("__src"),
            F.col("__carry.__p").alias("__p"),
            F.lit(None).cast(lb.schema["__l"].dataType).alias("__l"),
            "__bkt",
        )
    )
    ub = lb.unionByName(rb).unionByName(carries)
    w = (
        Window.partitionBy("__k", "__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ub.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
        F.col("__src") == 1
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    max_buckets_per_interval: int = 10_000,
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

    Guards: ``bucket_width`` must be a positive finite number (NaN
    would silently bucket nothing), and any single interval expanding
    to more than ``max_buckets_per_interval`` buckets raises at run
    time — a badly chosen ``bucket_width`` against one huge interval
    would otherwise explode into millions of replica rows (and Spark's
    ``sequence`` hard-errors past the max array length anyway, with a
    far less actionable message).
    """
    bw = float(bucket_width)
    if math.isnan(bw) or math.isinf(bw) or bw <= 0:
        raise ValueError(f"bucket_width must be positive and finite, got {bucket_width}")
    cap = int(max_buckets_per_interval)
    if cap < 1:
        raise ValueError(f"max_buckets_per_interval must be >= 1, got {cap}")
    lb = left.withColumn("__b", F.floor(F.col(left_val) / F.lit(bw)).cast("long"))
    blo = F.floor(F.col(lo_col) / F.lit(bw)).cast("long")
    bhi = F.floor(F.col(hi_col) / F.lit(bw)).cast("long")
    seq = F.when(
        # NULL-bounded intervals can't match any point: yield a NULL
        # array so explode drops them, instead of letting the NULL span
        # fall through to the raise_error branch and kill the job
        blo.isNull() | bhi.isNull(),
        F.lit(None).cast("array<long>"),
    ).when(
        bhi - blo < F.lit(cap),
        F.sequence(blo, bhi),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: interval [%s, %s] spans more than "
                f"{cap} buckets of width {bw!r}; raise bucket_width or "
                "max_buckets_per_interval",
                F.col(lo_col).cast("string"),
                F.col(hi_col).cast("string"),
            )
        ).cast("array<long>")
    )
    rb = right.withColumn("__b", F.explode(seq))
    return (
        lb.join(rb, "__b")
        .where((F.col(left_val) >= F.col(lo_col)) & (F.col(left_val) <= F.col(hi_col)))
        .drop("__b")
    )


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle equi-join for the big-big case where one key
    dominates the left side (the right side being too big to
    broadcast): left rows salt into ``salt_buckets`` sub-keys, the
    right side replicates once per bucket, and the join key becomes
    (key, salt) — a hot key's probe rows spread over ``salt_buckets``
    tasks instead of funneling into one straggler.

    Output is IDENTICAL to the plain ``left.join(right, key, how)``
    (every left row meets every matching right row exactly once —
    its one salt bucket holds a full right replica), which is the
    oracle contract: the operator buys distribution, never semantics.
    Supported ``how``: 'inner' and 'left' (right/full would need the
    unmatched-right bookkeeping a replica join can't express cheaply).

    Cost model: right side shuffles ``salt_buckets``× its size — use
    it when |right| · salt_buckets ≪ |left|'s hot-key mass, the same
    trade as every salting recipe (AQE's skew-join split handles
    sort-merge stragglers adaptively; this handles them structurally,
    and composes with bucketed layouts AQE can't touch).

    The salt is ``xxhash64(whole left row) mod salt_buckets`` —
    deterministic (re-runs salt identically), no RNG whose draw
    depends on partition layout. Identical duplicate left rows share a
    bucket; skew relief applies across DISTINCT rows of a hot key,
    which is the actual skew shape of fact tables.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    nb = int(salt_buckets)
    if nb < 2:
        raise ValueError(f"salt_buckets must be >= 2, got {salt_buckets}")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("column name '__salt' collides with salted_equi_join")
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(nb))
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(nb)]))
    )
    return l.join(r, [*keys, "__salt"], how).drop("__salt")
