"""TPC-H-shaped join/aggregation queries (Q1-Q21 shapes, CUBE/ROLLUP, ABC classification).

Consolidated from the former numeric registry batches 14, 18, 19, 24, 25, 26, 29, 37, 49 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry14.py
# ==================================================================

"""Registry batch 14 — CUBE/grouping-sets OLAP. (The fuzzy-dedup and
incremental-rollup queries that shared this batch moved to their
domains in round 6: registry_dedup / registry_events.)"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# ---------------------------------------------------------------------------
# OLAP CUBE (grouping sets with grouping flags)
# ---------------------------------------------------------------------------

@register(
    "events_cube",
    oracle="""
    SELECT grouping(event_type)::INT AS g_type,
           grouping(ubucket)::INT AS g_bucket,
           event_type, ubucket,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(14,4))) AS sum_value
    FROM (SELECT event_type, (user_id % 10)::BIGINT AS ubucket, value
          FROM events)
    GROUP BY CUBE (event_type, ubucket)
    """,
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, user bucket): all four grouping-set
    combinations in ONE pass (Catalyst expands the sets and shares the
    scan; the shuffle key space is the union of the set keys —
    4 * |groups| rows, not 4 scans). ``grouping()`` flags disambiguate
    aggregate NULLs from data NULLs; DECIMAL sums keep every
    total exact and order-free."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 10).cast("long").alias("ubucket"),
        F.col("value").cast("decimal(14,4)").alias("v"),
    )
    return (
        ev.cube("event_type", "ubucket")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("ubucket").cast("int").alias("g_bucket"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v").alias("sum_value"),
        )
        .select(
            "g_type", "g_bucket", "event_type", "ubucket", "n_events", "sum_value"
        )
    )


# ==================================================================
# former registry18.py
# ==================================================================

"""Registry batch 18 — TPC-H Q21 shape (semi + anti join choreography)
and Q2 shape (per-group argmin join)."""


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

# ==================================================================
# former registry19.py
# ==================================================================

"""Registry batch 19 — the remaining classic TPC-H join/agg shapes:
Q13 (outer-join count distribution), Q17 (per-group average threshold
filter), Q22 (anti-join + global scalar threshold).

All three use exact arithmetic across row boundaries (BIGINT counts,
DECIMAL sums, and the multiply-through trick ``x > avg(y)  <=>
x * cnt > sum(y)``) so the DuckDB oracle hash-matches bit-for-bit —
no float summation-order hazards.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders
    (excluding one priority class — the stand-in for Q13's comment
    filter; the testdata orders table has no o_comment).

    Scale notes: the orders side is filtered and column-pruned to
    (o_custkey) before the join; the LEFT join preserves zero-order
    customers (the part a naive inner-join + groupBy gets wrong). The
    first aggregate shuffles on c_custkey — the join key — so AQE
    reuses the exchange; the second aggregate's key space is tiny
    (max orders per customer), a few dozen groups regardless of SF.
    """
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH p AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
    ), li AS (
      SELECT l.l_partkey, l.l_quantity::BIGINT AS qty,
             l.l_extendedprice::DECIMAL(18,2) AS price
      FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
    ), stats AS (
      SELECT l_partkey, sum(qty)::BIGINT AS sum_qty,
             count(*)::BIGINT AS cnt
      FROM li GROUP BY l_partkey
    )
    SELECT (sum(li.price) / 7)::DECIMAL(18,6) AS avg_yearly
    FROM li JOIN stats s ON s.l_partkey = li.l_partkey
    WHERE li.qty * 5 * s.cnt < s.sum_qty
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems of one
    brand whose quantity is below 20% of that part's average quantity.

    The threshold ``qty < 0.2 * avg(qty)`` is multiplied through to
    ``qty * 5 * cnt < sum(qty)`` so the comparison is exact BIGINT
    arithmetic — no float-average boundary flakiness between engines
    (l_quantity is integral in TPC-H).

    Scale notes: the brand filter broadcasts (one brand of ~25 → part
    side is small); the per-part stats aggregate and the stats join
    both key on l_partkey so the exchange is reused; no correlated
    subquery — the classic decorrelation into join-against-aggregate.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        )
    )
    stats = li.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum("qty").cast("long").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(stats, li.l_partkey == stats.s_partkey)
        .where(F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum("price") / 7).cast("decimal(18,6)").alias("avg_yearly"))
    )


@register(
    "idle_customer_balance",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey,
             (c_acctbal * 100)::BIGINT AS bal_cents
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ), avg_pos AS (
      SELECT sum(bal_cents)::BIGINT AS tot, count(*)::BIGINT AS cnt
      FROM pool WHERE bal_cents > 0
    )
    SELECT p.c_nationkey::INT AS cntry,
           count(*)::BIGINT AS numcust,
           (sum(p.bal_cents)::DECIMAL(18,0) / 100)::DECIMAL(18,2)
             AS totacctbal
    FROM pool p, avg_pos a
    WHERE p.bal_cents * a.cnt > a.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY p.c_nationkey
    ORDER BY cntry
    """,
)
def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers — above-average
    balance (within a nation pool, vs the average of positive
    balances), no URGENT orders (the testdata gives every customer at
    least one order, so the idleness test keys on a priority class to
    stay non-trivial), grouped by nation.

    Balances are 2-decimal exact, so they move through the query as
    integer cents; ``bal > avg(pos_bal)`` becomes
    ``bal_cents * cnt > tot_cents`` — exact BIGINT on both engines.

    Scale notes: the scalar (tot, cnt) aggregate is one row,
    broadcast-crossed (no shuffle); the "no orders" test is a LEFT
    ANTI join on the customer key (never a count-subquery per row);
    the final aggregate has ≤25 groups.
    """
    pool = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    avg_pos = pool.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("tot"),
        F.count("*").alias("cnt"),
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_cents") * F.col("cnt") > F.col("tot"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents").cast("decimal(18,0)") / 100)
            .cast("decimal(18,2)")
            .alias("totacctbal"),
        )
        .orderBy("cntry")
    )

# ==================================================================
# former registry24.py
# ==================================================================

"""Registry batch 24 — growth accounting and the TPC-H Q15 shape:
daily new/cumulative user curve, and top-supplier-by-period-revenue
against a scalar max (the view + max-subquery decorrelation).
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "user_growth_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts))::DATE AS d0
      FROM events GROUP BY user_id
    ), daily_new AS (
      SELECT d0 AS day, count(*)::BIGINT AS new_users
      FROM first_seen GROUP BY d0
    ), dau AS (
      SELECT date_trunc('day', ts)::DATE AS day,
             count(DISTINCT user_id)::BIGINT AS active_users
      FROM events GROUP BY 1
    )
    SELECT d.day, coalesce(n.new_users, 0)::BIGINT AS new_users,
           d.active_users,
           sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
                                  ROWS UNBOUNDED PRECEDING)::BIGINT
             AS cumulative_users
    FROM dau d LEFT JOIN daily_new n USING (day)
    ORDER BY day
    """,
)
def q_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting over the event stream: per day, first-time
    users (by each user's min event day), distinct active users, and
    the running total of users ever seen — the new/active/cumulative
    triple behind every growth dashboard.

    Scale shape: first-seen is a combinable min per user; both daily
    frames aggregate before joining, so the join and the running-sum
    window operate on ≤|days| rows (the partition-less window sits
    ABOVE an aggregate — metadata-sized, the allowed case). Every
    user's full history never collects anywhere."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("d0"))
    daily_new = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    dau = ev.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("active_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(daily_new, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)).cast("long"))
        .select(
            "day",
            "new_users",
            "active_users",
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )


_Q15_START = "1996-01-01"
_Q15_END = "1996-04-01"


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '{_Q15_START}'
        AND l_shipdate < DATE '{_Q15_END}'
      GROUP BY l_suppkey
    ), best AS (
      SELECT max(total_revenue) AS mx FROM revenue
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    CROSS JOIN best b
    WHERE r.total_revenue = b.mx
    ORDER BY s.s_suppkey
    """,
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over a
    shipping quarter — the classic view + scalar-max-subquery,
    decorrelated into an aggregate joined against its own 1-row max
    (ALL ties returned, per Q15's spec).

    Revenue sums in DECIMAL so the max-equality comparison is exact —
    a float sum would make "equals the max" engine-dependent. The
    1-row max broadcasts; the supplier dim join broadcasts; the only
    shuffle is the revenue aggregate on l_suppkey."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit(_Q15_START).cast("date"))
            & (F.col("l_shipdate") < F.lit(_Q15_END).cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )

# ==================================================================
# former registry25.py
# ==================================================================

"""Registry batch 25 — TPC-H shape completion (Q4 semi-join priority
counts, Q14 conditional-share single pass, Q19 disjunctive-bracket
pushdown) and period-over-period growth with lag windows.

Money stays DECIMAL; the Q14/growth ratios divide two exact sums in
one float expression rounded to 6 dp — no accumulation-order hazard.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_Q4_START = "1996-01-01"
_Q4_END = "1996-07-01"
_Q4_LATE_DAYS = 60


@register(
    "late_order_priority_counts",
    oracle=f"""
    SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '{_Q4_START}'
      AND o.o_orderdate < DATE '{_Q4_END}'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a half-year window with at least one
    late-shipping lineitem (ship > order date + 60d — the testdata has
    no commitdate), counted by priority. The EXISTS decorrelates to a
    LEFT SEMI join — each qualifying order counts ONCE no matter how
    many lineitems were late, the bug a plain inner join would have.

    Scale notes: the date filter prunes orders before the join; the
    semi join carries only (orderkey, orderdate) against lineitem's
    (orderkey, shipdate) projection; the final aggregate has 5 groups."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_START).cast("date"))
        & (F.col("o_orderdate") < F.lit(_Q4_END).cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualified = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _Q4_LATE_DAYS)),
        "left_semi",
    )
    return (
        qualified.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q14_START = "1996-03-01"
_Q14_END = "1996-04-01"


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT round(
      100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                  THEN (l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)
                  ELSE 0::DECIMAL(18,6) END)::DOUBLE
      / sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6))::DOUBLE,
      6) AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '{_Q14_START}'
      AND l.l_shipdate < DATE '{_Q14_END}'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the promo type's share of one month's revenue —
    numerator and denominator from ONE conditional-aggregate pass (no
    second scan, no self-join), both DECIMAL-exact, divided once.

    Scale notes: the month filter prunes lineitem at the scan; part is
    the broadcast side; the aggregate is a single row."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q14_START).cast("date"))
        & (F.col("l_shipdate") < F.lit(_Q14_END).cast("date"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


@register(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6))
             AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 11 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 21 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue over an OR of three (brand, size,
    quantity) brackets — the disjunctive-predicate test. Catalyst
    splits the OR: the part-only conjuncts (brand ∈ {...}) push to the
    part scan as a derived filter, the quantity bounds push to
    lineitem (qty ≥ 1 covers all brackets), and the residual OR
    evaluates after the join — the join itself stays a plain equi-join
    on partkey, never a nested loop over the disjunction."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    br = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return j.where(br).agg(
        F.sum(rev).alias("revenue"), F.count("*").cast("long").alias("n_items")
    )


@register(
    "weekly_revenue_growth",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', o_orderdate)::DATE AS week,
             sum(o_totalprice::DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week, revenue,
           round((revenue::DOUBLE
                  - lag(revenue) OVER (ORDER BY week)::DOUBLE)
                 / lag(revenue) OVER (ORDER BY week)::DOUBLE * 100.0,
                 6) AS growth_pct
    FROM weekly ORDER BY week
    """,
)
def q_weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: weekly order revenue with the
    percent change against the previous week via a lag window — the
    WoW/MoM reporting staple. The first week's growth is NULL (no
    prior period), preserved as such.

    Scale shape: revenue aggregates to ≤|weeks| rows BEFORE the
    partition-less lag window touches anything (the allowed
    window-above-aggregate case); sums are DECIMAL so the growth ratio
    divides two exact numbers."""
    orders = read_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("week")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    w = Window.orderBy("week")
    prev = F.lag("revenue").over(w).cast("double")
    return weekly.select(
        "week",
        "revenue",
        F.round(
            (F.col("revenue").cast("double") - prev) / prev * 100.0, 6
        ).alias("growth_pct"),
    ).orderBy("week")

# ==================================================================
# former registry26.py
# ==================================================================

"""Registry batch 26 — the last TPC-H conditional shapes (Q12 bucketed
priority counts, Q16 distinct-supplier counts with an exclusion set)
and gaps-and-islands activity streaks.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "shipping_delay_priority_counts",
    oracle="""
    SELECT CASE WHEN delay <= 30 THEN '0-30'
                WHEN delay <= 60 THEN '31-60'
                WHEN delay <= 90 THEN '61-90'
                ELSE '90+' END AS delay_bucket,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             ::BIGINT AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             ::BIGINT AS low_line_count
    FROM (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def q_shipping_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lineitems bucketed by shipping delay (days from
    order to ship — the testdata's stand-in for Q12's shipmode), with
    urgent-vs-rest priority counts per bucket from ONE conditional
    aggregate — the CASE-inside-count pattern, never two scans.

    Scale notes: orders projects to (orderkey, priority, date) before
    the join; the aggregate has 4 groups and combines map-side."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "0-30")
        .when(delay <= 60, "31-60")
        .when(delay <= 90, "61-90")
        .otherwise("90+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count(F.when(high, 1)).cast("long").alias("high_line_count"),
            F.count(F.when(~high, 1)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "supplier_count_by_part_bracket",
    oracle="""
    SELECT p.p_brand,
           CASE WHEN p.p_size <= 25 THEN 'small' ELSE 'large' END AS size_class,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY 1, 2 ORDER BY p_brand, size_class
    """,
)
def q_supplier_count_by_part_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, size-class) bracket, excluding promo parts and a supplier
    blocklist (negative balance — the stand-in for Q16's complaints
    subquery). The NOT IN decorrelates to a LEFT ANTI join against the
    tiny excluded-supplier frame.

    Scale notes: lineitem is the part↔supplier bridge (the testdata
    has no partsupp); it reduces to (partkey, suppkey) DISTINCT pairs
    before the distinct-count shuffle; part and the blocklist both
    broadcast."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_type") != "PROMO")
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.distinct().join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    size_class = F.when(F.col("p_size") <= 25, "small").otherwise("large")
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", size_class.alias("size_class"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy("p_brand", "size_class")
    )


_STREAK_TOP = 20


@register(
    "user_activity_streaks",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events
    ), islands AS (
      SELECT user_id, d,
             d - (row_number() OVER (PARTITION BY user_id ORDER BY d))::INT
               AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, count(*)::BIGINT AS len,
             min(d) AS streak_start
      FROM islands GROUP BY user_id, anchor
    ), best AS (
      SELECT user_id, len, streak_start,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start ASC) AS rk
      FROM streaks
    )
    SELECT user_id, len AS longest_streak_days, streak_start
    FROM best WHERE rk = 1
    ORDER BY longest_streak_days DESC, user_id ASC LIMIT {_STREAK_TOP}
    """,
)
def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive active
    calendar days — the classic ``date − row_number`` island anchor
    (consecutive days share an anchor; any gap shifts it), then a
    per-user argmax with an earliest-start tie-break, top-20 overall.

    Scale shape: the distinct (user, day) reduction happens first (the
    raw event volume never reaches a window); both windows are
    PARTITIONED BY user_id; the final top-20 is a TakeOrdered, not a
    global sort."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").cast("long").alias("len"),
        F.min("d").alias("streak_start"),
    )
    rk = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(rk))
        .where("rk = 1")
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            "streak_start",
        )
        .orderBy(F.desc("longest_streak_days"), F.asc("user_id"))
        .limit(_STREAK_TOP)
    )

# ==================================================================
# former registry29.py
# ==================================================================

"""Registry batch 29 — the last five TPC-H query shapes (Q6, Q7, Q9,
Q11, Q20), completing full 22-query coverage of the classic join/agg
repertoire. The driver schema has no ``partsupp`` table, so Q9/Q11/Q20
are ADAPTED: the same plan shape (the part the engine must get right —
scalar-subquery HAVING, two-level dominant-share semi-join, multi-dim
star join) re-anchored on ``lineitem`` aggregates instead of
``ps_supplycost``/``ps_availqty``; each docstring states the mapping.

Exact-arithmetic discipline (same as registries 23-26): every revenue
sum is DECIMAL (order-independent), discount band membership compares
``round(d*100)`` integers (never raw double boundaries), and any
float that crosses a row boundary is rounded before comparison.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_DEC = "decimal(18,2)"


def _disc_pct() -> F.Column:
    # discount as exact integer percent (the generator steps by 0.01):
    # band/threshold comparisons never touch double representation
    return F.round(F.col("l_discount") * 100).cast("int")


def _rev() -> F.Column:
    # revenue = extendedprice * (1 - discount), exact: price
    # DECIMAL(18,2) times an exact DECIMAL fraction of 100
    one_minus_d = (F.lit(100) - _disc_pct()).cast("decimal(4,0)") / F.lit(100).cast(
        "decimal(4,0)"
    )
    return F.col("l_extendedprice").cast(_DEC) * one_minus_d


_REV_SQL = (
    "l_extendedprice::DECIMAL(18,2) * ((100 - round(l_discount * 100)::INT)"
    "::DECIMAL(4,0) / 100::DECIMAL(4,0))"
)


@register(
    "forecast_revenue_delta",
    oracle="""
    SELECT round(sum(l_extendedprice::DECIMAL(18,2)
                     * (round(l_discount * 100)::INT::DECIMAL(4,0)
                        / 100::DECIMAL(4,0)))::DOUBLE, 2) AS revenue_delta,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND round(l_discount * 100)::INT BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would have been gained by eliminating a
    discount band — one filtered scan-aggregate, zero joins.

    The plan to demand at 100 TB: all three predicates (date range,
    discount band, quantity) push to the parquet scan, the aggregate is
    map-side partial + 1-row final. Discount-band membership compares
    exact integer percent (``round(d*100)``), so the band edges never
    depend on double representation; the revenue product is DECIMAL."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_dec = _disc_pct().cast("decimal(4,0)") / F.lit(100).cast("decimal(4,0)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & _disc_pct().between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC) * disc_dec).cast("double"),
                2,
            ).alias("revenue_delta"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate)::INT AS l_year,
           round(sum({_REV_SQL})::DOUBLE, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year and
    direction — the bidirectional star join.

    Scale shape: the only big-big join is lineitem ⋈ orders on the
    shared ``orderkey`` shuffle; customer/supplier/nation are broadcast
    dims, and the nation-name disjunction is applied to the two
    broadcast sides BEFORE the fact join (Catalyst pushes each
    conjunct's half through its own dim), so non-qualifying customers
    and suppliers prune fact rows at the hash-join probes rather than
    after a full join."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    c = cust.join(F.broadcast(nc), "c_nationkey").where(
        F.col("cust_nation").isin("NATION_3", "NATION_7")
    )
    s = supp.join(F.broadcast(ns), "s_nationkey").where(
        F.col("supp_nation").isin("NATION_3", "NATION_7")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "cust_nation")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "supp_nation")), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("revenue"))
    )


@register(
    "product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate)::INT AS o_year,
           round(sum({_REV_SQL}
                     - l.l_quantity::DECIMAL(18,2)
                       * (p.p_retailprice::DECIMAL(18,2)
                          * (10::DECIMAL(4,0) / 100::DECIMAL(4,0))))::DOUBLE,
                 2) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit on a product line by supplier
    nation and order year. The driver schema has no ``partsupp``, so
    the per-unit supply cost ``ps_supplycost`` is stood in by 10% of
    ``p_retailprice`` — the PLAN is the point: a 5-table star join
    whose only big-big edge is lineitem ⋈ orders, with the part-name
    LIKE filter pushed through the broadcast part dim so the fact
    table prunes at the probe.

    Profit = revenue − quantity × unit-cost, all DECIMAL (the unit
    cost is an exact DECIMAL fraction of retail price), summed
    order-independently and rounded once at the end."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    unit_cost = F.col("p_retailprice").cast(_DEC) * (
        F.lit(10).cast("decimal(4,0)") / F.lit(100).cast("decimal(4,0)")
    )
    profit_term = _rev() - F.col("l_quantity").cast(_DEC) * unit_cost
    sn = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("nation"),
            )
        ),
        "s_nationkey",
    ).select("s_suppkey", "nation")
    return (
        li.join(
            F.broadcast(
                part.where(F.col("p_name").like("%gear%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(profit_term).cast("double"), 2).alias("profit"))
    )


@register(
    "important_part_value",
    oracle="""
    WITH scoped AS (
      SELECT l.l_partkey,
             round(l.l_extendedprice * 100)::BIGINT
               * (100 - round(l.l_discount * 100)::BIGINT) AS rev_e4
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    ), per_part AS (
      SELECT l_partkey, sum(rev_e4)::DECIMAL(38,0) AS value_e4
      FROM scoped GROUP BY 1
    ), total AS (
      SELECT sum(rev_e4)::DECIMAL(38,0) AS tot_e4 FROM scoped
    )
    SELECT p.l_partkey AS partkey, p.value_e4
    FROM per_part p CROSS JOIN total t
    WHERE p.value_e4 * 1000 > t.tot_e4
    """,
)
def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted): parts representing a significant
    share of one nation's traded value — GROUP BY ... HAVING against a
    scalar subquery over the same scoped rows. Without ``partsupp``,
    "value" is the nation's DECIMAL lineitem revenue per part instead
    of ``ps_supplycost * ps_availqty``; the shape under test is the
    same: one scoped scan feeding BOTH the per-group aggregate and the
    1-row total, with the total broadcast into the HAVING comparison
    (never a second scan, never a non-equi join).

    Arithmetic is EXACT INTEGER end-to-end: per-line revenue in 1e-4
    currency units is ``cents x (100 - discount_pct)`` (both bigint),
    sums widen to DECIMAL(38,0), and the 0.1% share threshold becomes
    the integer comparison ``value_e4 * 1000 > tot_e4`` — no double
    cast, no rounding, so group membership is bit-identical on both
    engines at any scale."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    sn = supp.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - _disc_pct().cast("long")
    )
    scoped = li.join(
        F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).select("l_partkey", rev_e4.alias("rev_e4"))
    dec = F.col("rev_e4").cast("decimal(38,0)")
    per_part = scoped.groupBy("l_partkey").agg(F.sum(dec).alias("value_e4"))
    total = scoped.agg(F.sum(dec).alias("tot_e4"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_e4") * 1000 > F.col("tot_e4"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_e4").cast("decimal(38,0)").alias("value_e4"),
        )
    )


@register(
    "dominant_supplier_parts",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             sum(l.l_quantity::DECIMAL(18,2)) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), per_part AS (
      SELECT l_partkey, sum(qty) AS tot FROM shipped GROUP BY 1
    ), dominant AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s JOIN per_part t USING (l_partkey)
      WHERE s.qty > t.tot * (50::DECIMAL(4,0) / 100::DECIMAL(4,0))
    )
    SELECT sup.s_suppkey AS suppkey, sup.s_name AS supp_name
    FROM supplier sup
    JOIN nation n ON sup.s_nationkey = n.n_nationkey
    JOIN dominant d ON sup.s_suppkey = d.l_suppkey
    WHERE n.n_name = 'NATION_8'
    """,
)
def q_dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers in one nation who are the
    DOMINANT source (>50% of shipped quantity) of some small-part line
    in a year. Without ``partsupp.ps_availqty``, the excess-stock
    predicate becomes a dominant-share predicate over the same
    two-level aggregate: per-(part, supplier) quantities roll up to
    per-part totals, the share comparison joins the rollup back on the
    part key, and qualifying suppliers semi-join the supplier dim.

    Scale shape: ONE shuffle on ``l_partkey`` serves both aggregation
    levels (the per-part rollup is a map-side-combinable re-agg of the
    first), the share join is partkey-aligned, and everything after it
    is distinct supplier keys — tiny. Quantities stay DECIMAL; the 50%
    threshold is an exact DECIMAL fraction."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.where(F.col("p_name").like("small%")).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )
    per_part = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    half = F.lit(50).cast("decimal(4,0)") / F.lit(100).cast("decimal(4,0)")
    dominant = (
        shipped.join(per_part, "l_partkey")
        .where(F.col("qty") > F.col("tot") * half)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_8")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("supp_name"))
    )

# ==================================================================
# former registry37.py
# ==================================================================

"""Registry batch 37 — the ROLLUP grouping-set shape (hierarchical
subtotals: leaf → per-type → grand total), completing the grouping-set
family next to `events_cube`'s full CUBE. Same one-Expand-pass plan,
DECIMAL-exact totals, grouping flags disambiguating subtotal NULLs.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "events_type_hour_rollup",
    oracle="""
    SELECT grouping(event_type)::INT AS g_type,
           grouping(hour_bucket)::INT AS g_hour,
           event_type, hour_bucket,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(14,4))) AS sum_value
    FROM (SELECT event_type, (hour(ts) // 6)::BIGINT AS hour_bucket, value
          FROM events)
    GROUP BY ROLLUP (event_type, hour_bucket)
    """,
)
def q_events_type_hour_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals over (event_type → 6-hour bucket): leaf
    groups, per-type subtotals, and the grand total from ONE pass —
    the drill-down backbone (CUBE materializes all 2ᵏ set
    combinations; ROLLUP only the k+1 prefix levels the hierarchy
    needs, so the Expand factor is linear in depth, not exponential).
    DECIMAL sums keep every subtotal exact and order-free; grouping
    flags tell subtotal NULLs from data NULLs."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.hour("ts") / 6).cast("int").cast("long").alias("hour_bucket"),
        F.col("value").cast("decimal(14,4)").alias("v"),
    )
    return ev.rollup("event_type", "hour_bucket").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("hour_bucket").cast("int").alias("g_hour"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v").alias("sum_value"),
    )

# ==================================================================
# former registry49.py
# ==================================================================

"""Registry batch 49 — ABC revenue classification (the 80/95 cumulative
cut) and funnel time-to-convert percentiles.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.events import funnel_stage_times
from datas_spark.registry_core import register


@register(
    "part_abc_classification",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             sum(round(l_extendedprice * 100)::BIGINT
                 * (100 - round(l_discount * 100)::BIGINT)) AS rev_e4
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum_e4,
             sum(rev_e4) OVER () AS tot_e4
      FROM per_part
    ), classed AS (
      SELECT l_partkey,
             CASE WHEN cum_e4 * 100 <= tot_e4 * 80 THEN 'A'
                  WHEN cum_e4 * 100 <= tot_e4 * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_e4
      FROM ranked
    )
    SELECT abc_class, count(*)::BIGINT AS n_parts,
           round(sum(rev_e4)::DOUBLE / max(tot) * 100, 6) AS revenue_share_pct
    FROM classed CROSS JOIN (SELECT sum(rev_e4) AS tot FROM per_part) t
    GROUP BY abc_class
    """,
)
def q_part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts sorted by revenue, class A
    until 80% of cumulative revenue, B until 95%, C after — reported
    as class sizes and realized shares. Revenue is the exact e4-integer
    unit (`important_part_value`'s discipline), the cumulative runs
    over the PER-PART AGGREGATE (a partition-less window is legitimate
    there — it orders |parts| rollup rows, not lineitems; the plan
    gate's aggregate-below rule), and class membership compares
    integers (`cum·100 ≤ tot·80`), never float shares.

    At part cardinalities where even the rollup frame strains one
    reducer (10¹⁰ SKUs), swap the cumulative window for the
    range-exchange + per-partition prefix + broadcast-offset
    construction `selection.skew_resistant_rank` already implements
    for ranks — identical output, no single-partition sort."""
    li = read_table(spark, sf_dir, "lineitem")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(rev_e4).alias("rev_e4"))
    w = Window.orderBy(F.col("rev_e4").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_part.select(
        "l_partkey",
        "rev_e4",
        F.sum("rev_e4").over(w).alias("cum_e4"),
        F.sum("rev_e4").over(wt).alias("tot_e4"),
    )
    abc = (
        F.when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 80, "A")
        .when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(abc.alias("abc_class"), "rev_e4", "tot_e4")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum("rev_e4").cast("double") / F.max("tot_e4").cast("double") * 100,
                6,
            ).alias("revenue_share_pct"),
        )
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    ), conv AS (
      SELECT s1.user_id,
             (epoch_us(s3.t3) - epoch_us(s1.t1)) AS us
      FROM s1 JOIN s3 USING (user_id)
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(quantile_cont(us::DOUBLE, 0.5) / 3.6e9, 6) AS median_hours,
           round(quantile_cont(us::DOUBLE, 0.9) / 3.6e9, 6) AS p90_hours
    FROM conv
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert through the view→click→purchase funnel: median
    and p90 hours from the first view to the first ordered purchase,
    over converting users. The stage chain reuses `funnel_stage_times`
    (one user_id shuffle key throughout); latencies are exact integer
    microseconds; the percentiles run in one combinable buffer over
    the ≤|users| converted frame."""
    ev = read_table(spark, sf_dir, "events")
    stage0, _stage1, stage2 = funnel_stage_times(ev, ["view", "click", "purchase"])
    us = F.unix_micros(F.col("t2").cast("timestamp")) - F.unix_micros(
        F.col("t0").cast("timestamp")
    )
    conv = stage0.join(stage2, "user_id").select(us.cast("double").alias("us"))
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("us", F.lit(0.5)) / 3.6e9, 6).alias("median_hours"),
        F.round(F.percentile("us", F.lit(0.9)) / 3.6e9, 6).alias("p90_hours"),
    )
