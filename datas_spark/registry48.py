"""Registry batch 48 — data forensics: Benford first-digit conformance
of order totals (fabricated/synthesized financial data screams here)
and the dispersion index of hourly event volume (Poisson-or-bursty).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# Benford expected first-digit probabilities log10(1 + 1/d), as exact
# literals shared by both engines
_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_SQL = "CASE " + " ".join(
    f"WHEN digit = {d} THEN {p!r}::DOUBLE" for d, p in _BENFORD.items()
) + " END"


@register(
    "benford_first_digit",
    oracle=f"""
    WITH digits AS (
      SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ), cells AS (
      SELECT digit, count(*)::BIGINT AS n FROM digits GROUP BY 1
    ), tot AS (
      SELECT sum(n)::BIGINT AS total FROM cells
    )
    SELECT c.digit, c.n,
           round(c.n::DOUBLE / t.total, 6) AS observed_p,
           round({_BENFORD_SQL}, 6) AS benford_p,
           round(pow(c.n::DOUBLE / t.total - {_BENFORD_SQL}, 2)
                 / {_BENFORD_SQL} * t.total, 6) AS chi2_term
    FROM cells c CROSS JOIN tot t
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: observed vs expected
    first-digit shares with per-digit chi-square terms — the
    fabrication/forensics screen (organic financial magnitudes follow
    log10(1+1/d); generated or tampered ones usually don't, and the
    chi2 terms localize WHICH digits give it away).

    First digits come from the integer part's string form (exact —
    no float log10 of the value itself), cells and the total are
    BIGINT, and the Benford expectations are shared literal constants;
    one grouped count + a 9-row broadcast-total expression."""
    orders = read_table(spark, sf_dir, "orders")
    # explicit floor: DuckDB's ::BIGINT cast ROUNDS while Spark's
    # truncates — floor first so both engines read the same digit
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    cells = (
        orders.where(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    expr = None
    for d, p in _BENFORD.items():
        expr = (
            F.when(F.col("digit") == d, F.lit(p))
            if expr is None
            else expr.when(F.col("digit") == d, F.lit(p))
        )
    bexp = expr
    obs = F.col("n").cast("double") / F.col("total")
    return cells.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(bexp, 6).alias("benford_p"),
        F.round(F.pow(obs - bexp, 2) / bexp * F.col("total"), 6).alias(
            "chi2_term"
        ),
    )


@register(
    "events_dispersion_index",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, count(*)::BIGINT AS n_hours,
           round(sum(n)::DOUBLE / count(*), 6) AS mean_per_hour,
           round((sum(n * n)::DOUBLE - sum(n)::DOUBLE * sum(n) / count(*))
                 / (count(*) - 1)
                 / (sum(n)::DOUBLE / count(*)), 6) AS dispersion_index
    FROM hourly GROUP BY event_type HAVING count(*) >= 2
    """,
)
def q_events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion index (variance/mean of hourly counts) per event
    type: ≈1 means Poisson-like arrivals; ≫1 means bursty/clumped
    traffic (bot storms, batch uploads) — the one-number companion to
    the rolling anomaly detector. Exact integer moments over the
    hourly aggregate; sample variance; one float division per type."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cnt = F.count(F.lit(1))
    sn = F.sum("n")
    snn = F.sum(F.col("n") * F.col("n"))
    mean = sn.cast("double") / cnt
    var = (snn.cast("double") - sn.cast("double") * sn / cnt) / (cnt - 1)
    return (
        hourly.groupBy("event_type")
        .agg(
            cnt.cast("long").alias("n_hours"),
            F.round(mean, 6).alias("mean_per_hour"),
            F.round(var / mean, 6).alias("dispersion_index"),
        )
        .where(F.col("n_hours") >= 2)
    )
