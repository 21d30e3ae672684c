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

Scale shape: the probe set is bounded and broadcast (the same
fixed-query-set contract as every ANN query here); distances are
evaluated map-side before the one exchange that sorts each test
point's ranking; each test point is an independent partition, so the
job parallelizes across probes and each per-probe sort is Spark's
spill-safe partition sort. The suffix sum is a running-frame window —
O(N) per probe, no self-join. Floats: the suffix sum accumulates
terms bounded by 1, so engine fold-order differences stay ~1e-12 and
rounding to 8 decimals yields engine-identical values; the cross-probe
mean then folds in explicit (test_id) order.
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
    w_rank = Window.partitionBy("test_id").orderBy(
        F.col("__d2").asc(), F.col("train_id").asc()
    )
    w_all = Window.partitionBy("test_id")
    ranked = scored.select(
        "test_id",
        "train_id",
        "matches",
        F.row_number().over(w_rank).alias("rank"),
    ).select(
        "*",
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.lead("matches").over(
            Window.partitionBy("test_id").orderBy(F.col("rank").asc())
        ).alias("__m_next"),
    )
    # delta_j = (m_j - m_{j+1}) / max(K, j) for j < N; 0 at j = N
    step = ranked.select(
        "*",
        F.when(
            F.col("rank") < F.col("__n"),
            (F.col("matches") - F.col("__m_next")).cast("double")
            / F.greatest(F.col("rank"), F.lit(k)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("__delta"),
        F.max(F.when(F.col("rank") == F.col("__n"), F.col("matches")))
        .over(w_all)
        .alias("__m_last"),
    )
    w_suffix = (
        Window.partitionBy("test_id")
        .orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return step.select(
        "test_id",
        "train_id",
        "rank",
        "matches",
        F.round(
            F.col("__m_last").cast("double") / F.col("__n")
            + F.sum("__delta").over(w_suffix),
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
