"""Registry batch 31 — compressed-domain ANN, customer RFM
segmentation, percent-of-parent OLAP rollup, and the timed funnel.

`sq8_topk` is the similarity family's storage-scale path: int8 scalar
quantization cuts first-pass scan bandwidth 4×, candidate ranking runs
on EXACT INTEGER dot products (deterministic at any cutoff), and only
k·oversample survivors per query are re-scored in float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import similarity as SIM
from datas_spark.operators.events import funnel_counts
from datas_spark.registry_core import register

_SQ8_ORACLE = """
    WITH amax AS (
      SELECT max(list_max(list_transform(embedding, x -> abs(x::DOUBLE)))) AS a
      FROM embeddings
    ), dq AS (
      SELECT e.vec_id, e.embedding,
             list_transform(e.embedding,
                            x -> round(x::DOUBLE * 127 / am.a)::BIGINT) AS q8
      FROM embeddings e CROSS JOIN amax am
    ), qq AS (
      SELECT vec_id AS qid, embedding AS qv, q8 AS qq8 FROM dq WHERE vec_id < 3
    ), scored AS (
      SELECT q.qid, d.vec_id AS did,
             list_sum(list_transform(range(1, len(d.q8) + 1),
                      i -> d.q8[i] * q.qq8[i]))::BIGINT AS s
      FROM dq d CROSS JOIN qq q
    ), kept AS (
      SELECT qid, did FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, did ASC) AS ar
        FROM scored
      ) WHERE ar <= 40
    ), rer AS (
      SELECT k.qid AS q_vec_id, k.did AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS cos
      FROM kept k JOIN dq d ON k.did = d.vec_id JOIN qq q ON k.qid = q.qid
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM rer
    ) WHERE rank <= 10
    """


@register("sq8_topk", oracle=_SQ8_ORACLE)
def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized ANN: integer-dot candidate pass (4× less scan
    bandwidth than float, deterministic ranking) + exact cosine rerank
    of 4k survivors per query. Same output contract as `cosine_topk`;
    the DuckDB twin replays quantization, integer ranking, and rerank
    bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.sq8_topk(
        emb, emb.where("vec_id < 3"), "vec_id", "vec_id", "embedding",
        k=10, oversample=4,
    )


_RFM_REF = "2001-09-01"  # 'now' anchor for recency (data ends 2001-08)


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), TIMESTAMP '{_RFM_REF}')::BIGINT
               AS recency_days,
             count(*)::BIGINT AS frequency,
             sum(o_totalprice::DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY 1
    ), thr AS (
      SELECT round(quantile_cont(recency_days::DOUBLE, 0.25), 6) AS r1,
             round(quantile_cont(recency_days::DOUBLE, 0.50), 6) AS r2,
             round(quantile_cont(recency_days::DOUBLE, 0.75), 6) AS r3,
             round(quantile_cont(frequency::DOUBLE, 0.25), 6) AS f1,
             round(quantile_cont(frequency::DOUBLE, 0.50), 6) AS f2,
             round(quantile_cont(frequency::DOUBLE, 0.75), 6) AS f3,
             round(quantile_cont(monetary::DOUBLE, 0.25), 6) AS m1,
             round(quantile_cont(monetary::DOUBLE, 0.50), 6) AS m2,
             round(quantile_cont(monetary::DOUBLE, 0.75), 6) AS m3
      FROM base
    )
    SELECT b.o_custkey AS custkey, b.recency_days, b.frequency,
           round(b.monetary::DOUBLE, 2) AS monetary,
           (5 - (CASE WHEN b.recency_days::DOUBLE <= t.r1 THEN 1
                      WHEN b.recency_days::DOUBLE <= t.r2 THEN 2
                      WHEN b.recency_days::DOUBLE <= t.r3 THEN 3
                      ELSE 4 END))::BIGINT AS r_score,
           (CASE WHEN b.frequency::DOUBLE <= t.f1 THEN 1
                 WHEN b.frequency::DOUBLE <= t.f2 THEN 2
                 WHEN b.frequency::DOUBLE <= t.f3 THEN 3
                 ELSE 4 END)::BIGINT AS f_score,
           (CASE WHEN b.monetary::DOUBLE <= t.m1 THEN 1
                 WHEN b.monetary::DOUBLE <= t.m2 THEN 2
                 WHEN b.monetary::DOUBLE <= t.m3 THEN 3
                 ELSE 4 END)::BIGINT AS m_score
    FROM base b CROSS JOIN thr t
    """,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs a
    fixed anchor), frequency (order count), monetary (DECIMAL revenue)
    per customer, each scored 1–4 by quartile — the classic
    rank-free segmentation.

    Scale shape: ONE per-customer aggregate pass; the nine quartile
    thresholds come from a single combinable percentile buffer
    (1-row frame, broadcast), and scoring is a map-side CASE — no
    global rank/ntile window over customers (the usual RFM
    implementation's single-reducer sort). Thresholds are rounded to
    6 dp before comparison so quartile membership is identical on
    both engines; recency inverts (recent = high score)."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_REF).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        )
        .cast("long")
        .alias("recency_days"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__mon"),
    )
    thr = base.agg(
        *[
            F.round(F.percentile(F.col(c).cast("double"), F.lit(p)), 6).alias(
                f"{pre}{i}"
            )
            for c, pre in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("__mon", "m"),
            )
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def bucket(col: str, pre: str) -> F.Column:
        v = F.col(col).cast("double")
        return (
            F.when(v <= F.col(f"{pre}1"), 1)
            .when(v <= F.col(f"{pre}2"), 2)
            .when(v <= F.col(f"{pre}3"), 3)
            .otherwise(4)
        )

    return base.crossJoin(F.broadcast(thr)).select(
        "custkey",
        "recency_days",
        "frequency",
        F.round(F.col("__mon").cast("double"), 2).alias("monetary"),
        (F.lit(5) - bucket("recency_days", "r")).cast("long").alias("r_score"),
        bucket("frequency", "f").cast("long").alias("f_score"),
        bucket("__mon", "m").cast("long").alias("m_score"),
    )


@register(
    "region_share_rollup",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice::DECIMAL(18,2)) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), reg AS (
      SELECT region, sum(rev) AS region_rev FROM nat GROUP BY 1
    ), tot AS (
      SELECT sum(rev) AS global_rev FROM nat
    )
    SELECT n.region, n.nation, round(n.rev::DOUBLE, 2) AS revenue,
           round(n.rev::DOUBLE / r.region_rev::DOUBLE * 100, 6)
             AS pct_of_region,
           round(r.region_rev::DOUBLE / t.global_rev::DOUBLE * 100, 6)
             AS region_pct_of_global
    FROM nat n JOIN reg r USING (region) CROSS JOIN tot t
    """,
)
def q_region_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchy rollup (nation→region→global): each
    nation's revenue share of its region and each region's share of
    the world — the drill-down table every OLAP UI renders.

    One fact aggregate at the finest grain; the coarser levels are
    re-aggregations of that ≤|nations|-row frame (never a second fact
    scan), joined back broadcast. Revenue sums stay DECIMAL; shares
    divide once, as doubles, rounded 6 dp."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    dim = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
    )
    nat = (
        orders.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("region", "nation")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    reg = nat.groupBy("region").agg(F.sum("rev").alias("region_rev"))
    tot = nat.agg(F.sum("rev").alias("global_rev"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("region_rev").cast("double") * 100,
                6,
            ).alias("pct_of_region"),
            F.round(
                F.col("region_rev").cast("double")
                / F.col("global_rev").cast("double")
                * 100,
                6,
            ).alias("region_pct_of_global"),
        )
    )


@register(
    "events_timed_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL '1 hour'
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL '1 hour'
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1)::BIGINT AS n_step_0,
           (SELECT count(*) FROM s2)::BIGINT AS n_step_1,
           (SELECT count(*) FROM s3)::BIGINT AS n_step_2,
           round(100.0 * (SELECT count(*) FROM s2)
                 / greatest((SELECT count(*) FROM s1), 1), 4) AS pct_1,
           round(100.0 * (SELECT count(*) FROM s3)
                 / greatest((SELECT count(*) FROM s2), 1), 4) AS pct_2
    """,
)
def q_events_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timed conversion funnel view→click→purchase where each stage
    must follow the previous within 1 hour — attribution semantics
    (the plain `events_funnel` counts a purchase a month later as
    converted; this one doesn't). Same per-stage min-agg chain on the
    one user_id shuffle key, one extra map-side interval predicate."""
    ev = read_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, ["view", "click", "purchase"], max_gap="1 hour"
    )
