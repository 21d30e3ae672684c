"""Key-distribution profiling: the diagnostic pass you run BEFORE
choosing a partitioning/salting strategy for a 100 TB join or agg.

Every skew mitigation in this engine (`asof_join(salt_buckets=)`,
`stratified_sample(skew_resistant=)`, `max_bucket_size` caps in the
near-dup family) needs a number to set; these operators produce it
from the data in one combinable aggregation pass:

- `heavy_keys`: the top-N hottest keys with absolute and relative
  frequency — the candidates for salting / broadcast side-channeling.
- `skew_stats`: one-row summary (total, distinct keys, max/avg group
  size, p50/p99 group size, skew ratio, suggested salt factor).

Scale design: both start from ``groupBy(key).count()`` — partial
counts fold map-side, so the shuffle carries one row per DISTINCT key
(the per-key count table), never the data. `heavy_keys` takes its
top-N via orderBy+limit (TakeOrderedAndProject: per-partition heaps +
a driver merge of N rows — no global sort). `skew_stats` aggregates
the count table down to a single row; its exact percentiles buffer
per-key counts, which is fine up to ~10^8 distinct keys — beyond
that, profile a `TABLESAMPLE` of the input (noted in the docstring
because the whole point of this module is not guessing at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_keys", "skew_stats"]


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information between two categorical columns, with both
    marginal entropies and the normalized MI — the dependence screen
    for corpus metadata (is ``lang`` just a proxy for ``source``?
    should a split stratify on both or is one redundant?). Chi² (see
    ``events_type_hour_chi2``) tests independence; MI *quantifies* it
    in bits-worth (nats here) usable across column pairs.

    Plan: one (a, b) grouped count over the data — the only full-data
    pass; marginals and the total re-aggregate the ≤ |a|·|b| joint
    rows. Every probability derives from exact BIGINT counts, and the
    three entropy sums each fold a SORTED collected array (cells by
    (a, b), marginals by key) so accumulation order — and hence the
    last float bit — is engine-identical, the Kaplan-Meier ordered-fold
    trick. Returns ONE row: (mi, h_a, h_b, nmi), rounded to 6; nmi
    NULL when either marginal entropy is 0 (a constant column carries
    no information to normalize by).
    """
    joint = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nab"))
    na = joint.groupBy("__a").agg(F.sum("__nab").cast("long").alias("__na"))
    nb = joint.groupBy("__b").agg(F.sum("__nab").cast("long").alias("__nb"))
    tot = joint.agg(F.sum("__nab").cast("long").alias("__n"))

    cells = (
        joint.join(na, "__a")
        .join(nb, "__b")
        .crossJoin(F.broadcast(tot))
        .select(
            "__a",
            "__b",
            (
                (F.col("__nab") / F.col("__n"))
                * F.log(
                    F.col("__n").cast("double")
                    * F.col("__nab")
                    / (F.col("__na").cast("double") * F.col("__nb"))
                )
            ).alias("__term"),
        )
    )

    def _fold(frame: DataFrame, keys: list[str], out: str) -> DataFrame:
        ordered = F.array_sort(
            F.collect_list(F.struct(*[F.col(k) for k in keys], F.col("__term")))
        )
        return frame.agg(
            F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x["__term"]).alias(out)
        )

    mi = _fold(cells, ["__a", "__b"], "__mi")
    ent_a = _fold(
        na.crossJoin(F.broadcast(tot)).select(
            "__a",
            (-(F.col("__na") / F.col("__n")) * F.log(F.col("__na") / F.col("__n"))).alias(
                "__term"
            ),
        ),
        ["__a"],
        "__ha",
    )
    ent_b = _fold(
        nb.crossJoin(F.broadcast(tot)).select(
            "__b",
            (-(F.col("__nb") / F.col("__n")) * F.log(F.col("__nb") / F.col("__n"))).alias(
                "__term"
            ),
        ),
        ["__b"],
        "__hb",
    )
    return (
        mi.crossJoin(ent_a)
        .crossJoin(ent_b)
        .select(
            (F.round("__mi", 6) + F.lit(0.0)).alias("mi"),
            (F.round("__ha", 6) + F.lit(0.0)).alias("h_a"),
            (F.round("__hb", 6) + F.lit(0.0)).alias("h_b"),
            F.when(
                (F.col("__ha") > 0) & (F.col("__hb") > 0),
                F.round(
                    F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")), 6
                )
                + F.lit(0.0),
            ).alias("nmi"),
        )
    )


def heavy_keys(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` hottest keys: ``(key, cnt bigint, share_pct
    double)`` ordered by ``cnt`` desc with the key value as the
    deterministic tie-break.

    The total used for ``share_pct`` comes from a second aggregation
    over the (already tiny per-distinct-key) count table, attached via
    a broadcast single-row cross join — no window over the full table.
    NULL keys count as a group (they are exactly the kind of hot key —
    e.g. a missing user id — this profiler exists to expose).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.lit(100.0) * F.col("cnt") / F.col("__total"), 4).alias(
                "share_pct"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
        .limit(top_n)
    )


def skew_stats(
    df: DataFrame, key_col: str, shuffle_partitions: int = 200
) -> DataFrame:
    """One-row skew summary of ``key_col``'s group-size distribution:

    ``total_rows, n_keys, max_cnt, avg_cnt, p50_cnt, p99_cnt,
    skew_ratio, suggested_salt``.

    ``skew_ratio`` is max/avg group size; ``suggested_salt`` is how
    many sub-keys the hottest key needs so no reducer gets more than an
    even 1/``shuffle_partitions`` share of the rows —
    ``ceil(max_cnt / (total / partitions))``, floored at 1. That is the
    number to hand to `asof_join(salt_buckets=)` / manual salting.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    even_share = F.col("total_rows").cast("double") / F.lit(float(shuffle_partitions))
    return counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
    ).select(
        "*",
        F.round(F.col("max_cnt") / F.col("avg_cnt"), 4).alias("skew_ratio"),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("max_cnt").cast("double") / even_share).cast("long"),
        ).alias("suggested_salt"),
    )
