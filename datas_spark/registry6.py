r"""Query registry, batch 6 (round 2): paragraph-level exact dedup,
weighted sampling without replacement, and sliding-window document
chunking (``operators/dedup.paragraph_dedup``, ``operators/corpus``).

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register
from datas_spark.registry5 import _MD5_UNIT_SQL

# The driver corpus has no newlines, so the registered query splits on a
# literal token delimiter to exercise the same plan a '\n+'-delimited web
# corpus would run. Short segments repeat heavily in the synthetic
# vocabulary, so the election genuinely fires.
_PARA_DELIM = " table "


@register(
    "paragraph_dedup",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, string_split_regex(text, '{_PARA_DELIM}') AS parts
      FROM documents
    ), p0 AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(parts) + 1),
          i -> {{'pos': i - 1, 'para': trim(parts[i])}})) AS u
      FROM s
    ), p AS (
      SELECT doc_id, u.pos AS pos, u.para AS para FROM p0
    ), e AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p WHERE length(para) >= 1
    ), kept AS (
      SELECT doc_id, pos, para FROM p WHERE length(para) < 1
      UNION ALL
      SELECT doc_id, pos, para FROM e WHERE rn = 1
    ), agg AS (
      SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, count(*) AS total FROM p GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.text_dedup, '') AS text_dedup,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept,
           (t.total - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style corpus-wide paragraph dedup: each distinct
    segment survives only at its globally-first (doc_id, position)
    occurrence; documents are reassembled from their surviving
    segments. The election is a min(struct) groupBy on md5(segment) —
    map-side combinable, no window over a hot segment's occurrences."""
    docs = read_table(spark, sf_dir, "documents")
    return D.paragraph_dedup(docs, "doc_id", "text", delimiter=_PARA_DELIM)


@register(
    "weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars > 0
    ORDER BY pow({_MD5_UNIT_SQL.format(key="doc_id::VARCHAR")},
                 1.0 / n_chars) DESC, doc_id ASC
    LIMIT 50
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement, k=50
    weighted by document length: key = u^(1/w) with the deterministic
    md5 uniform, global top-k via TakeOrderedAndProject (each task
    ships only its local k candidates — no full sort)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return C.weighted_sample(docs, "doc_id", "n_chars", k=50)


@register(
    "chunk_documents",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), s AS (
      -- starts cap at n - overlap - 1 (= len - 9): a later start's chunk
      -- would be fully contained in the previous chunk's span
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 9, 0) + 1, 24)) AS start
      FROM t
    )
    SELECT doc_id,
           (start / 24)::BIGINT AS chunk_id,
           len(toks[start + 1 : start + 32])::BIGINT AS n_tokens,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
    FROM s
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (32-token chunks, 8-token overlap →
    starts every 24): map-only, no shuffle; every token lands in at
    least one chunk, tail chunks may be short but never fully
    duplicate the previous chunk's span."""
    docs = read_table(spark, sf_dir, "documents")
    return C.chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8)


# Deterministic fake PII appended to the synthetic corpus (which contains
# none) so the detection/redaction patterns genuinely fire — the SAME
# expression runs on both engines.
_AUG_SQL = """
      SELECT doc_id,
        text ||
        CASE WHEN doc_id % 7 = 0
             THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0
             THEN ' call 555-123-4567 or ping 10.0.' || (doc_id % 256) || '.1'
             ELSE '' END AS text
      FROM documents
"""


def _augment_pii(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" call 555-123-4567 or ping 10.0."),
                    (did % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_EMAIL, _PHONE, _IP = (
    C.PII_PATTERNS["email"],
    C.PII_PATTERNS["phone"],
    C.PII_PATTERNS["ip"],
)


@register(
    "pii_stats",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL}'))::BIGINT AS n_email,
           len(regexp_extract_all(text, '{_PHONE}'))::BIGINT AS n_phone,
           len(regexp_extract_all(text, '{_IP}'))::BIGINT AS n_ip,
           CASE WHEN len(regexp_extract_all(text, '{_EMAIL}')) > 0
                  OR len(regexp_extract_all(text, '{_PHONE}')) > 0
                  OR len(regexp_extract_all(text, '{_IP}')) > 0
                THEN 1 ELSE 0 END AS has_pii
    FROM aug
    """,
)
def q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection counts over the corpus (with deterministic fake
    PII mixed in, since the synthetic corpus contains none): map-only
    regexp_count expressions, RE2-safe patterns shared with the
    oracle."""
    docs = read_table(spark, sf_dir, "documents")
    return C.pii_stats(_augment_pii(docs), "doc_id", "text").select(
        "doc_id", "n_email", "n_phone", "n_ip", "has_pii"
    )


@register(
    "pii_redact",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
               '{_PHONE}', '<PHONE>', 'g'),
             '{_IP}', '<IP>', 'g') AS text_redacted
    FROM aug
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: chained global regexp_replace to typed
    placeholders, email → phone → ip order on both engines."""
    docs = read_table(spark, sf_dir, "documents")
    return C.pii_redact(_augment_pii(docs), "text").select("doc_id", "text_redacted")


_BOW_WEIGHTS = [
    ("spark", 2.0),
    ("fast", 1.5),
    ("merge", 0.7),
    ("value", 0.3),
    ("table", -0.2),
    ("slow", -1.5),
]


@register(
    "bow_quality_score",
    oracle=r"""
    WITH w(term, weight) AS (VALUES """
    + ", ".join(f"('{t}', {v})" for t, v in _BOW_WEIGHTS)
    + r"""),
    t AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ), s AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(coalesce(w.weight, 0)) AS wsum
      FROM t LEFT JOIN w ON t.tok = w.term
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens,
           round(1.0 / (1.0 + exp(-(wsum / n_tokens))), 6) AS quality_prob
    FROM s
    """,
)
def q_bow_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear BoW quality classifier: tiny broadcast
    weight table (the model), map-side join against exploded tokens,
    one combinable per-doc aggregation, sigmoid of the mean token
    weight."""
    docs = read_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(_BOW_WEIGHTS, "term string, weight double")
    return C.bow_classifier_score(docs, "doc_id", "text", weights)


@register(
    "events_asof_click",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS r_ts, c.value AS r_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively): every purchase is
    enriched with the user's most recent prior-or-equal click. One
    union + one per-user ordered window — the same movement as a
    sort-merge join, no range scan. DuckDB's native ASOF JOIN is the
    oracle."""
    from datas_spark.operators import joins as J

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return J.asof_join(purchases, clicks, "user_id", "ts", "ts")


@register(
    "events_asof_click_salted",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS r_ts, c.value AS r_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_events_asof_click_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-salted AS-OF path against the identical oracle: rows
    salt into 8 timestamp-range buckets (the dominant user spreads over
    8 tasks), a tiny carry-in frame preserves exact as-of semantics —
    same answer, skew-proof plan."""
    from datas_spark.operators import joins as J

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return J.asof_join(purchases, clicks, "user_id", "ts", "ts", salt_buckets=8)


@register(
    "events_value_bands",
    oracle="""
    WITH bands AS (
      SELECT band_id, band_id * 50.0 AS lo, band_id * 50.0 + 49.999 AS hi
      FROM (SELECT unnest(range(0, 10)) AS band_id)
    )
    SELECT e.event_id, e.event_type, e.value, b.band_id
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
    """,
)
def q_events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (point-in-range) join via the bucketed equi-join plan —
    the big-big range-join strategy: intervals replicate into
    fixed-width buckets, points probe one bucket, BETWEEN filters
    within. The oracle is the plain theta join. The 10-row band table
    WOULD broadcast here; the query deliberately exercises the
    bucketed path, which is what survives when both sides are large."""
    from datas_spark.operators import joins as J

    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    spark_bands = spark.range(0, 10).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50.0).alias("lo"),
        (F.col("id") * 50.0 + 49.999).alias("hi"),
    )
    out = J.interval_join(ev, spark_bands, "value", "lo", "hi", bucket_width=50.0)
    return out.select("event_id", "event_type", "value", "band_id")


@register(
    "events_user_rolling",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER w3, 4) AS rolling_avg3,
           round(value - lag(value) OVER wl, 4) AS delta_prev,
           row_number() OVER wl AS event_seq
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wl AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_events_user_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered analytics (rolling mean over the last 3 events,
    delta vs previous, sequence number) — the window-function surface
    of a time-series feature pipeline. One shuffle on user_id, one
    in-partition sort shared by BOTH window frames (same partition ∧
    order ⇒ Spark reuses the sort)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w3 = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w3), 4).alias("rolling_avg3"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.row_number().over(w).alias("event_seq"),
    )


@register(
    "order_totals_rollup",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
           count(*) AS n_orders,
           sum(o.o_totalprice::DECIMAL(18,2)) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (nation, order_year)
    """,
)
def q_order_totals_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP over (nation, order year): subtotals per nation and
    the grand total in one pass — Spark expands grouping sets inside a
    single aggregate, one shuffle. Sums in DECIMAL(18,2) so subtotal
    and grand-total rows are exact (double summation order would
    wobble the last bits across engines)."""
    from pyspark.sql.functions import broadcast

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
            "o_totalprice",
        )
        .rollup("nation", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
    )


@register(
    "events_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           p.value AS purchase_value, c.ts AS click_ts, c.value AS click_value
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join
    (``streaming.join_streams``): every purchase paired with each
    same-user click at-or-before it within 1 hour. In streaming mode
    the same predicate's explicit time bound is what lets the state
    store evict buffered rows (watermark + gap); verified against the
    plain interval join here."""
    from datas_spark.streaming.scoring import join_streams

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    return join_streams(clicks, purchases)
