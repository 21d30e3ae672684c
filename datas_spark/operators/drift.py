"""Corpus drift detection: compare the term distributions of two
document slices (yesterday vs today, train vs eval, source A vs B) and
report where they diverge — the statistical smoke alarm for silent
pipeline changes, domain shift, and contamination of a held-out split.

The measure is the per-term Jensen-Shannon divergence contribution
over Laplace-smoothed unigram distributions. JS (unlike raw KL) is
finite for terms present on only one side and symmetric, so "top
contributing terms" reads the same from either direction.

Scale shape: each side reduces to its term-count table (one combinable
groupBy over exploded tokens); the totals and vocabulary size are a
tiny exact-integer aggregate broadcast back, and every contribution is
a PER-ROW float expression on exact integer inputs — no cross-row
float accumulation, so results hash-match the SQL twin exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from datas_spark.functions.text import word_tokens

__all__ = ["term_counts", "term_drift", "feature_psi"]


def term_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Lowercased whitespace term counts: ``(term, cnt bigint)``."""
    return (
        df.select(
            F.explode(
                F.transform(word_tokens(text_col), lambda w: F.lower(w))
            ).alias("term")
        )
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def term_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str,
    top_n: int = 20,
    smoothing: float = 0.5,
) -> DataFrame:
    """Top-``top_n`` terms by Jensen-Shannon divergence contribution
    between the corpora ``a`` and ``b``: ``(term, p_a, p_b,
    js_contrib)``, most divergent first (term asc tie-break).

    Probabilities are Laplace-smoothed over the UNION vocabulary —
    ``(cnt + s) / (total + s * V)`` — so one-sided terms contribute a
    finite, comparable amount. Each row's contribution is
    ``(pa*ln(pa/m) + pb*ln(pb/m)) / 2`` with ``m = (pa+pb)/2``.
    """
    ca = term_counts(a, text_col)
    cb = term_counts(b, text_col)
    joined = ca.withColumnRenamed("cnt", "ca").join(
        cb.withColumnRenamed("cnt", "cb"), "term", "full_outer"
    )
    consts = joined.agg(
        F.sum(F.coalesce("ca", F.lit(0))).cast("long").alias("ta"),
        F.sum(F.coalesce("cb", F.lit(0))).cast("long").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    s = float(smoothing)
    out = joined.crossJoin(broadcast(consts))
    pa = (F.coalesce("ca", F.lit(0)).cast("double") + F.lit(s)) / (
        F.col("ta").cast("double") + F.lit(s) * F.col("v").cast("double")
    )
    pb = (F.coalesce("cb", F.lit(0)).cast("double") + F.lit(s)) / (
        F.col("tb").cast("double") + F.lit(s) * F.col("v").cast("double")
    )
    m = (pa + pb) / F.lit(2.0)
    js = (pa * F.log(pa / m) + pb * F.log(pb / m)) / F.lit(2.0)
    return (
        out.select(
            "term",
            F.round(pa, 8).alias("p_a"),
            F.round(pb, 8).alias("p_b"),
            F.round(js, 10).alias("js_contrib"),
        )
        .orderBy(F.desc("js_contrib"), F.asc("term"))
        .limit(top_n)
    )


def feature_psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per bin for a numeric feature: bin
    edges are the REFERENCE distribution's quantiles (equal-population
    bins), both populations are bucketed by those shared edges, and
    each bin contributes ``(p_cur − p_ref) · ln(p_cur / p_ref)`` (with
    ``eps`` guarding empty bins). The standard model-monitoring drift
    score: PSI < 0.1 stable, > 0.25 action.

    Scale shape: edges are ONE exact-percentile aggregate on the
    reference (1 row, broadcast); bucketing is a map-side fold over
    the ``bins−1`` edge literals; per-bin counts are combinable. Rows
    are emitted per bin (sum client-side or over the sorted array) so
    the output is order-deterministic — no cross-engine float-sum
    ambiguity.

    NULL values are excluded from both populations (a NULL-rate drift
    check is a separate, simpler count).
    """
    v = F.col(value_col)
    cuts = ref.where(v.isNotNull()).agg(
        F.percentile(
            v, F.array(*[F.lit(i / bins) for i in range(1, bins)])
        ).alias("__cuts")
    )

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(v > c, 1).otherwise(0),
        )
        return (
            df.where(v.isNotNull())
            .join(F.broadcast(cuts))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    rc = bucketed(ref, "n_ref")
    cc = bucketed(cur, "n_cur")
    # every bin 0..bins-1 present even when empty on one side
    all_bins = (
        ref.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    )
    joined = (
        all_bins.join(rc, "bin", "left")
        .join(cc, "bin", "left")
        .join(
            F.broadcast(
                rc.agg(F.sum("n_ref").alias("__tr")).join(
                    cc.agg(F.sum("n_cur").alias("__tc"))
                )
            )
        )
    )
    p_ref = F.coalesce("n_ref", F.lit(0)) / F.col("__tr") + F.lit(eps)
    p_cur = F.coalesce("n_cur", F.lit(0)) / F.col("__tc") + F.lit(eps)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return joined.select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        F.round(term, 8).alias("psi_term"),
    )
