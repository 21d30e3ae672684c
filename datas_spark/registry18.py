"""Registry batch 18 — TPC-H Q21 shape (semi + anti join choreography)
and Q2 shape (per-group argmin join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# "late" = shipped more than 90 days after the order date (the testdata
# lineitem has no commitdate; the shape — not the predicate — is Q21's)
_LATE_DAYS = 90


@register(
    "late_supplier_blame",
    oracle=f"""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), blamed AS (
      SELECT DISTINCT a.l_orderkey, a.l_suppkey
      FROM li a
      WHERE a.late
        AND EXISTS (SELECT 1 FROM li b
                    WHERE b.l_orderkey = a.l_orderkey
                      AND b.l_suppkey != a.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM li c
                        WHERE c.l_orderkey = a.l_orderkey
                          AND c.l_suppkey != a.l_suppkey AND c.late)
    )
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC LIMIT 25
    """,
)
def q_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier orders — one semi join (another supplier exists) and
    one anti join (no OTHER supplier was late) against the same
    per-order frame, then a keyed count.

    Scale notes: the li frame reduces to (orderkey, suppkey, late)
    before any of the three self-references; all three shuffles share
    the l_orderkey key so AQE reuses the exchange; the supplier dim
    joins broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _LATE_DAYS)).alias(
                "late"
            ),
        )
    )
    a = base.where("late").select("l_orderkey", "l_suppkey").distinct()
    others = base.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s"), "late"
    )
    has_other = a.join(
        others,
        (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
        "left_semi",
    )
    no_other_late = has_other.join(
        others.where("late"),
        (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
        "left_anti",
    )
    return (
        no_other_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT p.p_partkey, l.l_suppkey,
             min(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS min_price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_partkey, l.l_suppkey
    ), best AS (
      SELECT p_partkey, l_suppkey, min_price,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY min_price ASC, l_suppkey ASC) AS rn
      FROM costs
    )
    SELECT b.p_partkey, s.s_name,
           CAST(b.min_price AS DECIMAL(14,2)) AS min_price
    FROM best b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE rn = 1
    ORDER BY b.p_partkey LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier per part — the correlated
    "price = (SELECT min ...)" subquery expressed as a per-part argmin
    (rank-1 window over the pre-aggregated (part, supplier) price
    table, deterministic supplier tie-break). The window partitions on
    p_partkey: per-key local sort, never a global one."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    costs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(14,2)")).alias("min_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("min_price"), F.asc("l_suppkey")
    )
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "s_name",
            F.col("min_price").cast("decimal(14,2)").alias("min_price"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# time-series resampling with linear interpolation
# ---------------------------------------------------------------------------

_RS_START = "2024-01-02 00:00:00"
_RS_END = "2024-01-03 00:00:00"
_RS_STEP = 3600
_RS_EPOCH = "2024-01-01 00:00:00"


@register(
    "events_resample_hourly",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT user_id FROM events WHERE user_id < 6
    ), grid AS (
      SELECT k.user_id, g.pos, NULL::DOUBLE AS v, 1 AS gr
      FROM keys k CROSS JOIN (
        SELECT unnest(range(
          date_diff('microseconds', TIMESTAMP '{_RS_EPOCH}', TIMESTAMP '{_RS_START}'),
          date_diff('microseconds', TIMESTAMP '{_RS_EPOCH}', TIMESTAMP '{_RS_END}'),
          {_RS_STEP}::BIGINT * 1000000)) AS pos
      ) g
    ), obs AS (
      SELECT user_id,
             date_diff('microseconds', TIMESTAMP '{_RS_EPOCH}', ts)::BIGINT AS pos,
             value::DOUBLE AS v, 0 AS gr
      FROM events
      WHERE user_id < 6
        AND ts >= TIMESTAMP '{_RS_START}' AND ts < TIMESTAMP '{_RS_END}'
    ), u AS (
      SELECT * FROM grid UNION ALL BY NAME SELECT * FROM obs
    ), w AS (
      SELECT user_id, pos, gr,
        last_value(v IGNORE NULLS) OVER bk AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER bk AS pp,
        first_value(v IGNORE NULLS) OVER fw AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER fw AS np
      FROM u
      WINDOW bk AS (PARTITION BY user_id ORDER BY pos ASC, gr ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (PARTITION BY user_id ORDER BY pos ASC, gr ASC
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, pos AS grid_us,
      round(CASE WHEN pp = np THEN pv
                 WHEN pp IS NOT NULL AND np IS NOT NULL
                   THEN pv + (nv - pv) * (pos - pp)::DOUBLE / (np - pp)::DOUBLE
                 WHEN pp IS NOT NULL THEN pv
                 WHEN np IS NOT NULL THEN nv END, 6) AS value
    FROM w WHERE gr = 1
    """,
)
def q_events_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize six users' irregular event values onto an hourly
    grid with linear interpolation (edge fill) — the native resampler
    Spark lacks, built from a map-side sequence explode and two
    per-key frame-bounded windows (`operators.timeseries`)."""
    from datas_spark.operators.timeseries import resample_interpolate

    ev = read_table(spark, sf_dir, "events").where("user_id < 6")
    return resample_interpolate(
        ev, "user_id", "ts", "value",
        start=_RS_START, end=_RS_END, step_seconds=_RS_STEP, epoch=_RS_EPOCH,
    )


# ---------------------------------------------------------------------------
# market-basket association rules over user event baskets
# ---------------------------------------------------------------------------

_AR_MIN_SUPPORT = 5


@register(
    "event_association_rules",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM baskets
    ), item AS (
      SELECT event_type, count(*)::BIGINT AS cnt FROM baskets GROUP BY 1
    ), pair AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs, count(*)::BIGINT AS both
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.lhs, p.rhs, p.both AS support_cnt,
           round(p.both::DOUBLE / ia.cnt, 6) AS confidence,
           round((p.both::DOUBLE / n.n_users)
                 / ((ia.cnt::DOUBLE / n.n_users) * (ib.cnt::DOUBLE / n.n_users)),
                 6) AS lift
    FROM pair p
    JOIN item ia ON ia.event_type = p.lhs
    JOIN item ib ON ib.event_type = p.rhs
    CROSS JOIN n
    WHERE p.both >= {_AR_MIN_SUPPORT}
    """,
)
def q_event_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type
    baskets: support, confidence and lift for every co-occurring pair —
    the pairwise core of FP-growth-style mining. Baskets reduce to
    DISTINCT (user, type) first, so the self-join fans out only over
    the tiny per-user type set; all stats come from exact integer
    counts (the floats are per-row ratios)."""
    ev = read_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = baskets.select("user_id").distinct().count()
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    b2 = baskets.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("rhs")
    )
    pair = (
        baskets.join(
            b2,
            (F.col("user_id") == F.col("u2"))
            & (F.col("event_type") < F.col("rhs")),
        )
        .groupBy(F.col("event_type").alias("lhs"), "rhs")
        .agg(F.count(F.lit(1)).cast("long").alias("both"))
        .where(F.col("both") >= _AR_MIN_SUPPORT)
    )
    ia = item.select(F.col("event_type").alias("lhs"), F.col("cnt").alias("ca"))
    ib = item.select(F.col("event_type").alias("rhs"), F.col("cnt").alias("cb"))
    nu = float(n_users)
    return (
        pair.join(F.broadcast(ia), "lhs")
        .join(F.broadcast(ib), "rhs")
        .select(
            "lhs",
            "rhs",
            F.col("both").alias("support_cnt"),
            F.round(F.col("both").cast("double") / F.col("ca"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("both").cast("double") / F.lit(nu))
                / (
                    (F.col("ca").cast("double") / F.lit(nu))
                    * (F.col("cb").cast("double") / F.lit(nu))
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# exact-integer Pearson correlation between two event types' hourly volumes
# ---------------------------------------------------------------------------

@register(
    "events_type_correlation",
    oracle="""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS h,
             count(*) FILTER (WHERE event_type = 'view')::BIGINT AS x,
             count(*) FILTER (WHERE event_type = 'click')::BIGINT AS y
      FROM events GROUP BY 1
    ), s AS (
      SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
             sum(x * y)::BIGINT AS sxy
      FROM hours
    )
    SELECT n, round(
      (n * sxy - sx * sy)::DOUBLE
      / (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)),
      6) AS pearson_r
    FROM s
    """,
)
def q_events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between view and click hourly volumes,
    computed from EXACT integer sums (n, Σx, Σy, Σx², Σy², Σxy over
    hourly counts) so the statistic is order-independent and
    bit-reproducible — the way to do distributed corr when the inputs
    are counts. One conditional-aggregate pass over events, one
    single-row reduction."""
    ev = read_table(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("x"),
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("y"),
    )
    s = hours.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select("n", F.round(num / den, 6).alias("pearson_r"))
