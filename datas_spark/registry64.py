"""Registry batch 64 — markdown code-block stats, attribution-model
comparison (first/last/linear on one match set), and deterministic
curriculum ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

# fenced code blocks, non-greedy, no lookarounds/backrefs (RE2-safe)
_FENCE_RE = r"```[\s\S]*?```"


@register(
    "code_block_stats",
    oracle=rf"""
    WITH b AS (
      SELECT doc_id, length(text) AS n_chars,
             regexp_extract_all(text, '{_FENCE_RE}') AS blocks
      FROM documents
    )
    SELECT doc_id,
           len(blocks)::BIGINT AS n_code_blocks,
           coalesce(list_sum(list_transform(blocks, x -> length(x))), 0)::BIGINT
             AS code_chars,
           round(CASE WHEN n_chars > 0
                 THEN coalesce(list_sum(list_transform(blocks, x -> length(x))), 0)
                      / n_chars::DOUBLE END, 6) AS code_frac
    FROM b
    """,
)
def q_code_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown fenced-code-block extraction per doc (count, chars,
    fraction) — the code-vs-prose composition signal corpus mixtures
    balance on. Non-greedy RE2-safe fence regex, map-only."""
    docs = read_table(spark, sf_dir, "documents")
    blocks = F.regexp_extract_all("text", F.lit(_FENCE_RE), F.lit(0))
    out = docs.withColumn("__b", blocks)
    code_chars = F.aggregate(
        F.col("__b"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return out.select(
        "doc_id",
        F.size("__b").cast("long").alias("n_code_blocks"),
        F.coalesce(code_chars, F.lit(0)).cast("long").alias("code_chars"),
        F.round(
            F.when(
                F.length("text") > 0,
                F.coalesce(code_chars, F.lit(0)) / F.length("text").cast("double"),
            ),
            6,
        ).alias("code_frac"),
    )


@register(
    "attribution_compare",
    oracle="""
    WITH conv AS (
      SELECT event_id AS cid, user_id AS u, ts AS cts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id AS u, ts AS tts, event_id AS tid,
             json_extract(props, '$.k')::INT AS item
      FROM events WHERE event_type = 'view'
    ), m AS (
      SELECT c.cid, c.cents, t.item, t.tts, t.tid
      FROM conv c JOIN touch t
        ON c.u = t.u AND t.tts >= c.cts - INTERVAL 60 MINUTE AND t.tts < c.cts
    ), ord AS (
      SELECT cid, cents, item,
             row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rf,
             row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC)
               AS rl,
             count(*) OVER (PARTITION BY cid) AS n
      FROM m
    ), per AS (
      SELECT cid, any_value(cents) AS cents, any_value(n) AS n,
             max(CASE WHEN rf = 1 THEN item END) AS first_item,
             max(CASE WHEN rl = 1 THEN item END) AS last_item
      FROM ord GROUP BY cid
    ), linear AS (
      SELECT m.item, sum((m.cents * 1000000) // per.n)::BIGINT AS linear_e6
      FROM m JOIN per USING (cid) GROUP BY m.item
    ), firsts AS (
      SELECT first_item AS item, sum(cents * 1000000)::BIGINT AS first_e6
      FROM per GROUP BY 1
    ), lasts AS (
      SELECT last_item AS item, sum(cents * 1000000)::BIGINT AS last_e6
      FROM per GROUP BY 1
    )
    SELECT item,
           coalesce(first_e6, 0) AS first_e6,
           coalesce(last_e6, 0) AS last_e6,
           coalesce(linear_e6, 0) AS linear_e6
    FROM linear
    FULL OUTER JOIN firsts USING (item)
    FULL OUTER JOIN lasts USING (item)
    """,
)
def q_attribution_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch vs linear attribution from ONE
    (conversion, touch) match set — the three standard models priced
    side by side per item, all in exact integer micro-cents. The
    first/last election is an arg_min/arg_max on (ts, event_id) — a
    total order, so ties are deterministic."""
    ev = read_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("cts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    m = conv.join(touch, "u").where(
        (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 60 MINUTES"))
        & (F.col("tts") < F.col("cts"))
    )
    per = m.groupBy("cid", "cents").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("item", F.struct("tts", "tid")).alias("first_item"),
        F.max_by("item", F.struct("tts", "tid")).alias("last_item"),
    )
    linear = (
        m.join(per.select("cid", "n"), "cid")
        .select("item", F.expr("cents * 1000000L div n").alias("__s"))
        .groupBy("item")
        .agg(F.sum("__s").cast("long").alias("linear_e6"))
    )
    firsts = per.groupBy(F.col("first_item").alias("item")).agg(
        F.sum(F.col("cents") * 1000000).cast("long").alias("first_e6")
    )
    lasts = per.groupBy(F.col("last_item").alias("item")).agg(
        F.sum(F.col("cents") * 1000000).cast("long").alias("last_e6")
    )
    return (
        linear.join(firsts, "item", "full_outer")
        .join(lasts, "item", "full_outer")
        .select(
            "item",
            F.coalesce("first_e6", F.lit(0)).alias("first_e6"),
            F.coalesce("last_e6", F.lit(0)).alias("last_e6"),
            F.coalesce("linear_e6", F.lit(0)).alias("linear_e6"),
        )
    )


@register(
    "curriculum_order",
    oracle="""
    WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents
    ), r1 AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) - 1 AS r
      FROM documents
    ), staged AS (
      SELECT doc_id, ((r * 10) // n_docs)::INT AS stage FROM r1 CROSS JOIN n
    )
    SELECT doc_id, stage,
           row_number() OVER (
             ORDER BY stage ASC, md5(doc_id::VARCHAR) ASC, doc_id ASC) - 1
             AS position
    FROM staged
    QUALIFY doc_id % 11 = 0
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: difficulty staged easy→hard (length-rank
    decile stand-in for the difficulty score, ``stage = ⌊rank·10/N⌋``),
    rows shuffled WITHIN a stage by md5 — the deterministic epoch
    order a curriculum trainer consumes. Both global ranks come from
    the skew-proof range-exchange construction (`with_row_id`), never
    a single-reducer window; the mod-11 slice bounds driver output
    AFTER the full-corpus ranks are fixed."""
    from datas_spark.io.sources import with_row_id

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = with_row_id(docs, order_by=[F.col("n_chars"), F.col("doc_id")], name="__r")
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    staged = ranked.join(F.broadcast(n)).select(
        "doc_id",
        ((F.col("__r") * 10) / F.col("__n")).cast("int").alias("stage"),
    )
    positioned = with_row_id(
        staged,
        order_by=[
            F.col("stage"),
            F.md5(F.col("doc_id").cast("string")),
            F.col("doc_id"),
        ],
        name="position",
    )
    return positioned.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", "stage", "position"
    )
