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

from __future__ import annotations

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
