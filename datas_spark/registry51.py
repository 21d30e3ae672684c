"""Registry batch 51 — deterministic Poisson bootstrap: confidence
intervals on a 100 TB mean without RNG state. Classic bootstrap
resampling is awkward distributed (per-replica multinomial draws need
coordinated randomness); the Poisson bootstrap replaces each row's
replica count with an independent Poisson(1) draw — and OUR draw is a
hash, so every engine, run, and partitioning produces the same
replicas, which is what makes the whole thing oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_B = 32  # bootstrap replicas
_G = _B // 4  # md5 digests per row (each 32-hex digest yields 4 units)

# Poisson(1) inverse-CDF cutoffs, exact shared literals
_POIS_CDF = []
acc = 0.0
for k in range(6):
    acc += math.exp(-1) / math.factorial(k)
    _POIS_CDF.append(acc)

# unit draw for replica b: hex chars [1+8*(b%4), +8) of digest b//4.
# One digest feeds four replicas — 8 md5s per row instead of 32.
_U_SQL = (
    "(('0x' || substr(md5(o_orderkey::VARCHAR || ':' || (b // 4)::VARCHAR),"
    " 1 + 8 * (b % 4), 8))::BIGINT / 4294967296.0)"
)
_W_SQL = "CASE " + " ".join(
    f"WHEN {_U_SQL} < {c!r}::DOUBLE THEN {k}" for k, c in enumerate(_POIS_CDF)
) + " ELSE 6 END"


@register(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
      SELECT o.o_orderkey, round(o.o_totalprice * 100)::BIGINT AS cents, t.b
      FROM orders o CROSS JOIN (SELECT unnest(range({_B})) AS b) t
    ), weighted AS (
      SELECT b, ({_W_SQL})::BIGINT AS w, cents FROM reps
    ), per_rep AS (
      SELECT b, sum(w * cents)::BIGINT AS wsum, sum(w)::BIGINT AS n
      FROM weighted GROUP BY b HAVING sum(w) > 0
    ), means AS (
      SELECT b, wsum::DOUBLE / n / 100.0 AS m FROM per_rep
    ), point AS (
      SELECT sum(round(o_totalprice * 100)::BIGINT)::DOUBLE
               / count(*) / 100.0 AS pm
      FROM orders
    )
    SELECT count(*)::BIGINT AS n_replicas,
           round(max(p.pm), 6) AS point_mean,
           round(quantile_cont(m, 0.025), 6) AS ci_lo,
           round(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM means CROSS JOIN point p
    """,
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean order total via {_B}
    hash-deterministic Poisson(1) replicas: replica b of a row draws
    its resample count from hex window b%4 of md5(key:b//4) through
    the shared inverse-CDF cutoffs, per-replica weighted means reduce
    from exact integer cents, and the interval is the 2.5/97.5
    percentile of the {_B} replica means.

    Scale shape: 8 md5 digests per ROW (not per replica), computed in
    a projection BELOW the replica explode — the Generate is a barrier,
    so CollapseProject cannot re-inline the digests into the
    inverse-CDF when-chain (which would evaluate each md5 6×; measured
    ~5× on this query before the barrier). Post-explode work per
    replica row is a substring+conv on a carried digest. Each
    replica's moments are ONE combinable aggregate and the final
    percentile runs over {_B} rows. No RNG state, no driver
    coordination, bit-identical on any partitioning."""
    orders = read_table(spark, sf_dir, "orders")
    digests = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.transform(
            F.sequence(F.lit(0), F.lit(_G - 1)),
            lambda g: F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit(":"),
                    g.cast("string"),
                )
            ),
        ).alias("__h"),
    )
    reps = digests.select(
        "cents", "__h", F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b")
    )
    u = (
        F.conv(
            F.substring(
                F.element_at(F.col("__h"), (F.col("b") / 4).cast("int") + 1),
                F.lit(1) + 8 * (F.col("b") % 4),
                F.lit(8),
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    expr = None
    for k, c in enumerate(_POIS_CDF):
        expr = (
            F.when(u < F.lit(c), k) if expr is None else expr.when(u < F.lit(c), k)
        )
    w = expr.otherwise(6).cast("long")
    per_rep = (
        reps.select("b", w.alias("w"), "cents")
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wsum"),
            F.sum("w").alias("n"),
        )
        .where(F.col("n") > 0)
    )
    means = per_rep.select(
        (F.col("wsum").cast("double") / F.col("n") / 100.0).alias("m")
    )
    point = orders.agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 100.0
        ).alias("pm")
    )
    return means.crossJoin(F.broadcast(point)).agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.round(F.max("pm"), 6).alias("point_mean"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
    )
