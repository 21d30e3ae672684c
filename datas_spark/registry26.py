"""Registry batch 26 — the last TPC-H conditional shapes (Q12 bucketed
priority counts, Q16 distinct-supplier counts with an exclusion set)
and gaps-and-islands activity streaks.
"""

from __future__ import annotations

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
