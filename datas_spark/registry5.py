r"""Query registry, batch 5 (round 2): corpus-level curation operators —
decontamination, stratified sampling, per-source quota caps, TF-IDF,
sequence packing (``operators/corpus.py``).

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.registry_core import register

# DuckDB twin of the whitespace 3-gram shingling used across the dedup
# family (tokens[i:i+2] is an INCLUSIVE DuckDB slice = 3 tokens)
_SHINGLES_CTE = r"""
    sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(grams) AS g FROM sh
    )
"""


@register(
    "ngram_contamination",
    oracle=f"""
    WITH {_SHINGLES_CTE}, bench AS (
      SELECT DISTINCT g FROM ex WHERE doc_id < 20
    ), cnt AS (
      SELECT e.doc_id, count(DISTINCT e.g) AS shared_ngrams
      FROM ex e JOIN bench b ON e.g = b.g
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           coalesce(c.shared_ngrams, 0) AS shared_ngrams,
           CASE WHEN coalesce(c.shared_ngrams, 0) >= 5 THEN 1 ELSE 0 END
             AS contaminated
    FROM documents d LEFT JOIN cnt c USING (doc_id)
    """,
)
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: count distinct 3-gram shingles each
    corpus doc shares with the benchmark slice (doc_id < 20 stands in
    for an eval suite), flag >= 5 shared. Benchmark shingle set is
    broadcast — the corpus side never shuffles text."""
    docs = read_table(spark, sf_dir, "documents")
    return C.ngram_contamination(
        docs, docs.where("doc_id < 20"), "doc_id", "text", n=3, min_shared=5
    )


@register(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS m
      FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rk <= ceil(m * 0.1)
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% stratified sample per language: md5-hash order
    (seed-free, layout-independent), ceil guarantees >= 1 row per
    stratum — the tail-language guarantee plain sample() loses."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return C.stratified_sample(docs, "lang", "doc_id", 0.1)


@register(
    "source_quota_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents
    ) WHERE rk <= 15
    """,
)
def q_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap every source at its first 15 docs so no
    single crawl dominates the mixture."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return C.source_quota_cap(docs, "source", "doc_id", 15)


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM toks WHERE t != '' GROUP BY doc_id, t
    ), dfq AS (
      SELECT t, count(*) AS dfc FROM tf GROUP BY t
    ), n AS (
      SELECT count(DISTINCT doc_id) AS nd FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.t, tf.tf,
             tf.tf * ln(n.nd::DOUBLE / dfq.dfc) AS tfidf_raw
      FROM tf JOIN dfq USING (t) CROSS JOIN n
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_raw DESC, t ASC) AS rank
      FROM scored
    )
    SELECT doc_id, t AS term, tf, round(tfidf_raw, 6) AS tfidf, rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 terms by TF-IDF (tf * ln(N/df), textbook raw-count
    form). Two reused aggregations + a term-key join; the rank window
    sees only each doc's own distinct terms."""
    docs = read_table(spark, sf_dir, "documents")
    return C.tfidf_top_terms(docs, "doc_id", "text", k=5)


@register(
    "pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT source, doc_id,
        len(list_filter(
          string_split_regex(trim(regexp_replace(lower(text), '([^\w\s])', ' \1 ', 'g')), '\s+'),
          t -> t != ''))::BIGINT AS n_tokens
      FROM documents
    )
    SELECT source, doc_id, n_tokens,
      ((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - n_tokens) // 500)::BIGINT AS bin
    FROM t
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-source running token cumsum -> 500-token
    bin index (contiguous greedy fill; a straddling doc stays in the
    bin it started). Shards pack in parallel — the sequential part is
    bounded by one source's token mass."""
    docs = read_table(spark, sf_dir, "documents")
    return C.pack_sequences(docs, "doc_id", "text", budget=500, shard_col="source")


_MD5_UNIT_SQL = "(('0x' || substr(md5({key}), 1, 8))::BIGINT / 4294967296.0)"


@register(
    "hash_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_MD5_UNIT_SQL.format(key="doc_id::VARCHAR")} < 0.9
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by md5(doc_id) — map-only,
    layout-independent (randomSplit is not), engine-portable."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return C.hash_split(docs, "doc_id")


@register(
    "group_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_MD5_UNIT_SQL.format(key="lang")} < 0.8
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: the GROUP key (lang here; a dedup component
    label in production) decides the split, so related rows never
    straddle the train/test boundary."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return C.group_split(docs, "lang", {"train": 0.8, "test": 0.2})


@register(
    "repetition_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), b AS (
      SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS ndt,
        list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> toks[i] || ' ' || toks[i + 1]) AS bg
      FROM t
    ), e AS (
      SELECT doc_id, unnest(bg) AS g FROM b
    ), c AS (
      SELECT doc_id, max(cnt) AS mx FROM (
        SELECT doc_id, g, count(*) AS cnt FROM e GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
      round(CASE WHEN nt > 0 THEN 1 - ndt::DOUBLE / nt ELSE 0 END, 6)
        AS dup_token_frac,
      round(CASE WHEN len(bg) > 0 THEN coalesce(mx, 0)::DOUBLE / len(bg)
                 ELSE 0 END, 6) AS top_bigram_frac
    FROM b LEFT JOIN c USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality stats, fully map-side: the
    top-bigram count is the longest equal run in the SORTED bigram-hash
    array (one aggregate fold) — the oracle proves parity with the
    unnest+groupBy formulation."""
    docs = read_table(spark, sf_dir, "documents")
    return C.repetition_stats(docs, "doc_id", "text")


@register(
    "events_enriched",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_events,
           sum(e.value::DECIMAL(18,6)) AS total_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment's batch twin: events left-join a small
    customer dimension (broadcast) then aggregate per market segment.
    Decimal sums keep the oracle exact (double sums are
    order-dependent). The identical plan runs per-micro-batch in
    streaming via streaming.scoring.enrich_stream."""
    from datas_spark.streaming.scoring import enrich_stream

    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        enrich_stream(ev, cust, "user_id")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
    )


@register(
    "temperature_sample",
    oracle=f"""
    WITH c AS (
      SELECT lang, count(*) AS nd FROM documents GROUP BY lang
    ), t AS (
      SELECT *, sum(nd) OVER () AS total FROM c
    ), w AS (
      SELECT *, pow(nd::DOUBLE / total, 1.0 / 2.0) AS wgt FROM t
    ), r AS (
      SELECT lang,
             least(1.0, (total * (wgt / sum(wgt) OVER ())) / nd) AS rate
      FROM w
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
    WHERE {_MD5_UNIT_SQL.format(key="d.doc_id::VARCHAR")} < r.rate
    """,
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture rebalancing at tau=2: the dominant language
    (en, ~44% of docs) is downsampled toward the flattened share while
    rare languages keep all rows (rate capped at 1) — deterministic
    md5 row selection, corpus touched once, never shuffled."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return C.temperature_sample(docs, "lang", "doc_id", temperature=2.0)


@register(
    "events_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(json_extract(props, '$.k')::INT) AS sum_k,
           max(json_extract(props, '$.k')::INT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column extraction: parse the props JSON with an
    EXPLICIT schema via from_json (typed, codegen'd, no sampling
    inference pass over 100 TB) and aggregate the extracted field per
    event type. Integer sums keep the oracle exact."""
    ev = read_table(spark, sf_dir, "events")
    parsed = ev.withColumn("__p", F.from_json("props", "k int"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__p.k")).alias("sum_k"),
        F.max(F.col("__p.k")).alias("max_k"),
    )


def _dedup_safe_split_oracle() -> str:
    from datas_spark.oracle_shared import (
        NEAR_DEDUP_RESOLVE_ORACLE as _NEAR_DEDUP_RESOLVE_ORACLE,
    )

    unit = _MD5_UNIT_SQL.format(key="component::VARCHAR")
    return f"""
    WITH resolved AS (
      {_NEAR_DEDUP_RESOLVE_ORACLE}
    )
    SELECT doc_id, component,
           CASE WHEN {unit} < 0.8 THEN 'train' ELSE 'test' END AS split
    FROM resolved
    """


@register("dedup_safe_split", oracle=_dedup_safe_split_oracle())
def q_dedup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage-safe pipeline end-to-end: n-gram Jaccard pairs →
    connected components → split decided by the COMPONENT label, so a
    near-duplicate cluster can never straddle the train/test boundary.
    Composes three operator families in one lazy plan, same oracle
    recursion as near_dedup_resolve plus the md5 split."""
    from datas_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    resolved = D.near_dedup_keep_first(docs, "doc_id", pairs)
    return C.group_split(
        resolved.select("doc_id", "component"), "component", {"train": 0.8, "test": 0.2}
    )


@register(
    "event_funnel",
    oracle="""
    WITH clicks AS (
      SELECT user_id, min(ts) AS first_click FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), conv AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN clicks c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
      GROUP BY e.user_id
    )
    SELECT c.user_id,
           CASE WHEN v.first_purchase IS NOT NULL THEN 1 ELSE 0 END AS converted,
           date_diff('second', c.first_click, v.first_purchase)::BIGINT
             AS secs_to_convert
    FROM clicks c LEFT JOIN conv v USING (user_id)
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first click -> first purchase at or
    after it. Two keyed aggregations and a broadcast-size join on
    user_id — no per-user window sort over the raw event stream."""
    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return clicks.join(conv, "user_id", "left").select(
        "user_id",
        F.col("first_purchase").isNotNull().cast("int").alias("converted"),
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_click")
        ).alias("secs_to_convert"),
    )


@register(
    "ngram_lm_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
    ), cbg AS (
      SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2
    ), cctx AS (
      SELECT w1, sum(c) AS cc FROM cbg GROUP BY w1
    ), p AS (
      SELECT cbg.w1, cbg.w2, ln(cbg.c::DOUBLE / cctx.cc) AS lp
      FROM cbg JOIN cctx USING (w1)
    ), s AS (
      SELECT bg.doc_id, count(*) AS n_bigrams, round(-avg(p.lp), 6) AS nll
      FROM bg JOIN p ON bg.w1 = p.w1 AND bg.w2 = p.w2
      GROUP BY bg.doc_id
    )
    SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.nll
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
)
def q_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram LM negative log-likelihood per doc (the
    CCNet/KenLM-style quality signal): one training aggregate over
    8-byte bigram hash keys, one scoring join, per-doc average."""
    docs = read_table(spark, sf_dir, "documents")
    return C.ngram_lm_score(docs, "doc_id", "text")


@register(
    "near_dedup_keep_best",
    oracle=r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    ), best AS (
      SELECT component, doc_id AS keep_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM labeled
    )
    SELECT l.doc_id, l.component,
           CASE WHEN b.keep_id = l.doc_id THEN 1 ELSE 0 END AS is_representative
    FROM labeled l JOIN best b ON l.component = b.component AND b.rn = 1
    """,
)
def q_near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEITA-style survivor election: among near-duplicates keep the
    HIGHEST-scored doc (n_chars as the score here; any scorer column
    works), not the first — min_by over a negated-score struct, one
    map-side-combinable aggregate per component, no per-component sort
    window."""
    from datas_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    return D.near_dedup_keep_best(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", pairs
    ).select("doc_id", "component", "is_representative")


@register(
    "expect_documents",
    oracle="""
    WITH t AS (SELECT count(*) AS total FROM documents)
    SELECT 'text_not_null' AS rule,
           (SELECT count(*) FROM documents
            WHERE NOT coalesce(text IS NOT NULL, false)) AS violations,
           t.total, CASE WHEN (SELECT count(*) FROM documents
            WHERE NOT coalesce(text IS NOT NULL, false)) = 0
            THEN 1 ELSE 0 END AS pass FROM t
    UNION ALL
    SELECT 'n_chars_positive',
           (SELECT count(*) FROM documents
            WHERE NOT coalesce(n_chars > 0, false)), t.total,
           CASE WHEN (SELECT count(*) FROM documents
            WHERE NOT coalesce(n_chars > 0, false)) = 0
            THEN 1 ELSE 0 END FROM t
    UNION ALL
    SELECT 'n_chars_matches_text',
           (SELECT count(*) FROM documents
            WHERE NOT coalesce(length(text) = n_chars, false)), t.total,
           CASE WHEN (SELECT count(*) FROM documents
            WHERE NOT coalesce(length(text) = n_chars, false)) = 0
            THEN 1 ELSE 0 END FROM t
    UNION ALL
    SELECT 'doc_id_unique',
           t.total - (SELECT count(DISTINCT doc_id) FROM documents), t.total,
           CASE WHEN t.total = (SELECT count(DISTINCT doc_id) FROM documents)
            THEN 1 ELSE 0 END FROM t
    """,
)
def q_expect_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative content-quality gate over documents: 4 named rules
    evaluated in ONE aggregate over one scan (plus a distinct-count
    for the uniqueness rule) — the validation stage a pipeline runs
    before anything expensive."""
    from datas_spark.operators.validate import expect

    docs = read_table(spark, sf_dir, "documents")
    base = expect(
        docs,
        {
            "text_not_null": F.col("text").isNotNull(),
            "n_chars_positive": F.col("n_chars") > 0,
            "n_chars_matches_text": F.length("text") == F.col("n_chars"),
        },
    )
    uniq = docs.agg(
        (F.count(F.lit(1)) - F.count_distinct("doc_id")).alias("violations"),
        F.count(F.lit(1)).alias("total"),
    ).select(
        F.lit("doc_id_unique").alias("rule"),
        "violations",
        "total",
        (F.col("violations") == 0).cast("int").alias("pass"),
    )
    return base.unionByName(uniq)


@register(
    "vocab_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), c AS (
      SELECT t, count(*) AS n FROM toks WHERE t != '' GROUP BY t
    )
    SELECT t AS term, n FROM c ORDER BY n DESC, t ASC LIMIT 50
    """,
)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vocabulary head: top-50 tokens by corpus frequency — one
    explode, one count aggregate, TakeOrdered for the limit (no full
    sort of the vocabulary)."""
    from datas_spark.functions.text import word_tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode_outer(word_tokens("text")).alias("__t"))
        .where(F.col("__t").isNotNull() & (F.col("__t") != ""))
        .select(F.lower("__t").alias("term"))
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(50)
    )


@register(
    "corpus_profile",
    oracle=r"""
    SELECT lang,
           count(*) AS n_docs,
           sum(n_chars) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (the table-stats pass a pipeline runs
    first): counts, char totals/extremes, source cardinality — one
    aggregate, integer sums exact, avg rounded at the oracle boundary."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count_distinct("source").alias("n_sources"),
    )


# The composed curation-recipe oracle: every stage's already-proven CTE
# chained in the SAME order the Spark plan runs them — repetition filter
# (rounded fractions), exact dedup among repetition survivors,
# decontamination of dedup survivors vs the RAW doc_id<20 slice,
# temperature rates computed over the POST-contamination counts, split
# hash last. A wiring bug between stages (wrong input frame, stage
# order, filter polarity) now hash-mismatches instead of hiding.
_NORM_SQL = (
    r"trim(regexp_replace(regexp_replace(lower({t}), '[^\w\s]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

_CURATE_CTES = rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ), b AS (
      SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS ndt,
        list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> toks[i] || ' ' || toks[i + 1]) AS bg
      FROM t
    ), e AS (
      SELECT doc_id, unnest(bg) AS g FROM b
    ), c AS (
      SELECT doc_id, max(cnt) AS mx FROM (
        SELECT doc_id, g, count(*) AS cnt FROM e GROUP BY doc_id, g
      ) GROUP BY doc_id
    ), rep AS (
      SELECT b.doc_id,
        round(CASE WHEN nt > 0 THEN 1 - ndt::DOUBLE / nt ELSE 0 END, 6)
          AS dup_token_frac,
        round(CASE WHEN len(bg) > 0 THEN coalesce(mx, 0)::DOUBLE / len(bg)
                   ELSE 0 END, 6) AS top_bigram_frac
      FROM b LEFT JOIN c USING (doc_id)
    ), rep_keep AS (
      SELECT doc_id FROM rep
      WHERE dup_token_frac <= 0.9 AND top_bigram_frac <= 0.9
    ), ded AS (
      SELECT doc_id FROM (
        SELECT d.doc_id, row_number() OVER (
          PARTITION BY md5({_NORM_SQL.format(t='d.text')})
          ORDER BY d.doc_id) AS rn
        FROM documents d JOIN rep_keep USING (doc_id)
      ) WHERE rn = 1
    ), {_SHINGLES_CTE.strip()}, bench AS (
      SELECT DISTINCT g FROM ex WHERE doc_id < 20
    ), cont AS (
      SELECT e.doc_id, count(DISTINCT e.g) AS shared
      FROM ex e JOIN ded USING (doc_id) JOIN bench bn ON e.g = bn.g
      GROUP BY e.doc_id
    ), clean AS (
      SELECT d.doc_id FROM ded d LEFT JOIN cont USING (doc_id)
      WHERE coalesce(shared, 0) < 5
    ), sv AS (
      SELECT c.doc_id, d.lang FROM clean c JOIN documents d USING (doc_id)
    ), cnt AS (
      SELECT lang, count(*) AS nd FROM sv GROUP BY lang
    ), tt AS (
      SELECT *, sum(nd) OVER () AS total FROM cnt
    ), w AS (
      SELECT *, pow(nd::DOUBLE / total, 1.0 / 2.0) AS wgt FROM tt
    ), r AS (
      SELECT lang, least(1.0, (total * (wgt / sum(wgt) OVER ())) / nd) AS rate
      FROM w
    )"""

# the final stage as a standalone SELECT so other oracles (the audit
# query in registry13) can re-wrap it as a CTE
_CURATE_FINAL_SQL = f"""
    SELECT s.doc_id, s.lang,
           CASE WHEN {_MD5_UNIT_SQL.format(key="s.doc_id::VARCHAR")} < 0.9
                THEN 'train' ELSE 'test' END AS split
    FROM sv s JOIN r USING (lang)
    WHERE {_MD5_UNIT_SQL.format(key="s.doc_id::VARCHAR")} < r.rate
"""

_CURATE_ORACLE = _CURATE_CTES + _CURATE_FINAL_SQL


@register("curate_corpus", oracle=_CURATE_ORACLE)
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation recipe in one lazy plan: repetition filter ->
    exact dedup -> decontamination vs the doc_id<20 slice ->
    temperature rebalancing by lang -> deterministic split. The oracle
    is the stage CTEs composed in the identical order, so the
    COMPOSITION (stage wiring, input frames, filter polarity) is
    hash-checked, not just the pieces."""
    from datas_spark.pipeline.curate import curate_corpus

    docs = read_table(spark, sf_dir, "documents")
    out = curate_corpus(
        docs,
        benchmark=docs.where("doc_id < 20"),
        domain_col="lang",
        max_dup_token_frac=0.9,
        max_top_bigram_frac=0.9,
        temperature=2.0,
        split_weights={"train": 0.9, "test": 0.1},
    )
    return out.select("doc_id", "lang", "split")
