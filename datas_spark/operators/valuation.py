"""Data valuation: exact closed-form KNN-Shapley over an embedding
table.

Jia et al. 2019 ("Efficient Task-Specific Data Valuation for Nearest
Neighbor Algorithms", VLDB 12(11)) prove the Shapley value of every
training point under a K-NN classifier utility has an exact O(N log N)
per-test-point form: sort training points by distance to the test
point, then a single suffix recursion assigns each rank its value.
This replaces the exponential subset enumeration the Shapley
definition implies — and the recursion is pure window algebra, so the
whole valuation is one shuffle-sort per test point, no Python loop.

With ``alpha_j`` the j-th closest training point to test t and
``m_j = 1[label(alpha_j) = label(t)]``:

    s_N = m_N / N
    s_j = s_{j+1} + (m_j - m_{j+1}) * min(K, j) / (K * j)

and ``min(K, j) / (K * j)`` simplifies to ``1 / max(K, j)``, so

    s_j = m_N / N + sum_{t=j}^{N-1} (m_t - m_{t+1}) / max(K, t)

— a suffix sum over rank order. The per-point value is the mean of
``s`` over the test probe set (Shapley linearity over per-test
utilities).

Scale shape (round-7, VERDICT r6 "Next round" #2): the probe set is
bounded and broadcast (the same fixed-query-set contract as every ANN
query here); distances are evaluated map-side. The per-probe ranking
and suffix recursion are computed TWO-LEVEL — the pattern proven in
``events.watermark_lateness_counts``: ONE balanced range exchange on
``(test_id, distance, train_id)``, partition-LOCAL rank / lead /
suffix-sum windows (partitioned by the physical partition id so no
single task ever sorts a whole probe's training set), and broadcast
per-(partition, probe) carries (counts, boundary matches, delta
totals) combined via windows over the tiny segment frame only. At
100x the per-probe work spreads across every partition the range
exchange assigns it, instead of serializing N rows through one core
per probe. Floats: the suffix sum accumulates terms bounded by 1, so
fold-order differences between the two-level and flat folds stay
~1e-12 and rounding to 8 decimals yields engine-identical values; the
cross-probe mean then folds in explicit (test_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["knn_shapley_pairs", "knn_shapley_values"]


def _sq_euclid(a: str, b: str):
    """Squared euclidean distance between two array<float> columns,
    accumulated in array-index order (engine-reproducible fold)."""
    return F.aggregate(
        F.zip_with(
            F.col(a), F.col(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_shapley_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-(test, train) exact KNN-Shapley contributions.

    Returns ``(test_id, train_id, rank, matches, shapley)`` where
    ``rank`` is the distance rank of the training point for that test
    point (1 = closest; squared-euclidean rounded to 6 decimals, ties
    broken by train id so the ranking is engine-exact) and ``shapley``
    is the training point's Shapley value under the K-NN utility for
    that single test point, rounded to 8 decimals.

    The efficiency property holds per test point:
    ``sum_i shapley(t, i) = (# matches among t's K nearest) / K`` —
    tested as an invariant.

    Scale shape: NO window is partitioned solely by ``test_id`` over
    raw rows. One ``repartitionByRange`` on (test_id, distance, id)
    spreads each probe's ranking across many partitions; every raw-row
    window below partitions by the PHYSICAL partition id, and the
    cross-partition glue (rank offsets, boundary lead, suffix-sum
    carries, last-row match) rides a broadcast per-(partition, probe)
    segment frame of at most ``parts x |probes|`` rows.
    """
    t = test.select(
        F.col(id_col).alias("test_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
    )
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).alias("__dv"),
        F.col(label_col).alias("__dl"),
    )
    scored = (
        tr.crossJoin(broadcast(t))
        .select(
            "test_id",
            "train_id",
            (F.col("__dl") == F.col("__ql")).cast("int").alias("matches"),
            F.round(_sq_euclid("__dv", "__qv"), 6).alias("__d2"),
        )
    )
    parts = int(
        num_partitions
        or scored.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # ONE balanced range exchange in global (probe, distance) order;
    # pin ONE materialization so the segment-stats pass and the row
    # pass see identical range boundaries (same contract as
    # skew_resistant_rank / watermark_lateness_counts)
    ranged = (
        scored.repartitionByRange(
            parts, F.col("test_id"), F.col("__d2"), F.col("train_id")
        )
        .sortWithinPartitions("test_id", "__d2", "train_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_loc = Window.partitionBy("__pid", "test_id").orderBy(
        F.col("__d2").asc(), F.col("train_id").asc()
    )
    local = ranged.select(
        "*",
        F.row_number().over(w_loc).alias("__lrn"),
        F.lead("matches").over(w_loc).alias("__lead_m"),
    )
    # tiny per-(partition, probe) segment stats: row count plus the
    # first/last row's matches in segment order (struct min/max on the
    # exact sort key, so ties resolve identically to the row windows)
    seg = ranged.groupBy("__pid", "test_id").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.min(
            F.struct(F.col("__d2"), F.col("train_id"), F.col("matches"))
        ).alias("__first"),
        F.max(
            F.struct(F.col("__d2"), F.col("train_id"), F.col("matches"))
        ).alias("__last"),
    )
    w_prev = (
        Window.partitionBy("test_id")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_probe = Window.partitionBy("test_id")
    w_ord = Window.partitionBy("test_id").orderBy("__pid")
    seg2 = seg.select(
        "__pid",
        "test_id",
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__offset"),
        F.sum("__cnt").over(w_probe).alias("__n"),
        # the row AFTER a segment's last row is the NEXT segment's first
        F.lead(F.col("__first.matches")).over(w_ord).alias("__next_first_m"),
        # the probe's last-ranked row lives in its max-pid segment
        F.max(
            F.struct(F.col("__pid").alias("p"), F.col("__last.matches").alias("m"))
        )
        .over(w_probe)
        .getField("m")
        .alias("__m_last"),
    )
    rows = local.join(F.broadcast(seg2), ["__pid", "test_id"]).select(
        "__pid",
        "test_id",
        "train_id",
        "matches",
        "__lrn",
        "__n",
        "__m_last",
        (F.col("__lrn") + F.col("__offset")).cast("int").alias("rank"),
        F.coalesce(F.col("__lead_m"), F.col("__next_first_m")).alias("__m_next"),
    )
    # delta_j = (m_j - m_{j+1}) / max(K, j) for j < N; 0 at j = N.
    # Two consumers below (the row-level suffix window and the
    # per-segment delta totals) — pin ONE materialization so the rank
    # windows + segment join are not re-evaluated per branch
    step = rows.withColumn(
        "__delta",
        F.when(
            F.col("rank") < F.col("__n"),
            (F.col("matches") - F.col("__m_next")).cast("double")
            / F.greatest(F.col("rank"), F.lit(k)).cast("double"),
        ).otherwise(F.lit(0.0)),
    ).localCheckpoint(eager=False)
    # suffix sum two-level: partition-local running sum in rank-desc
    # order, plus a broadcast carry of the delta totals of all
    # HIGHER-rank segments of the same probe
    w_suf_loc = (
        Window.partitionBy("__pid", "test_id")
        .orderBy(F.col("__lrn").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_suf = step.withColumn("__lsuf", F.sum("__delta").over(w_suf_loc))
    seg_delta = step.groupBy("__pid", "test_id").agg(
        F.sum("__delta").alias("__dtot")
    )
    w_carry = (
        Window.partitionBy("test_id")
        .orderBy(F.col("__pid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seg_delta.select(
        "__pid",
        "test_id",
        F.coalesce(F.sum("__dtot").over(w_carry), F.lit(0.0)).alias("__carry"),
    )
    return local_suf.join(F.broadcast(carry), ["__pid", "test_id"]).select(
        "test_id",
        "train_id",
        "rank",
        "matches",
        F.round(
            F.col("__m_last").cast("double") / F.col("__n")
            + F.col("__lsuf")
            + F.col("__carry"),
            8,
        ).alias("shapley"),
    )


def knn_shapley_values(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-training-point KNN-Shapley value: the mean of the per-test
    contributions over the probe set, folded in explicit test_id order
    (engine-identical accumulation), rounded to 6 decimals. Returns
    ``(train_id, n_tests, value)`` — the ranking to curate by: points
    with negative value actively hurt the K-NN proxy and are the
    mislabeled/outlier removal candidates."""
    pairs = knn_shapley_pairs(train, test, id_col, vec_col, label_col, k=k)
    return (
        pairs.groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_tests"),
            F.array_sort(
                F.collect_list(F.struct(F.col("test_id"), F.col("shapley")))
            ).alias("__terms"),
        )
        .select(
            "train_id",
            "n_tests",
            F.round(
                F.aggregate(
                    "__terms", F.lit(0.0), lambda acc, x: acc + x["shapley"]
                )
                / F.col("n_tests"),
                6,
            ).alias("value"),
        )
    )
