"""Registry batch 61 — tokenizer-fit and structure observability:
OOV rate per source against a corpus-learned vocabulary, sentence
segmentation stats, and JSON payload key profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import tokenize
from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_VOCAB_N = 1000

# sentence chunks without lookarounds (RE2-safe, identical in both
# engines): runs ending in terminal punctuation, or a final tail
_SENT_RE = r"[^.!?]*[.!?]+|[^.!?]+$"


@register(
    "oov_rate_by_source",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source, unnest(list_filter(string_split_regex(
               regexp_replace(lower(text), '([^\w\s])', ' \1 ', 'g'),
               '\s+'), x -> x != '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ORDER BY c DESC, tok ASC LIMIT {_VOCAB_N}
      )
    )
    SELECT source,
           count(*)::BIGINT AS n_tokens,
           count(*) FILTER (vocab.tok IS NULL)::BIGINT AS n_oov,
           round(count(*) FILTER (vocab.tok IS NULL) / count(*)::DOUBLE * 100, 6)
             AS oov_pct
    FROM toks LEFT JOIN vocab USING (tok)
    GROUP BY source
    """,
)
def q_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit check: learn a top-{_VOCAB_N} vocabulary from the
    whole corpus (count desc, token asc — a deterministic stand-in for
    a trained tokenizer's vocab), then measure each source's
    out-of-vocabulary token rate — the screen that catches a feed
    whose token distribution the tokenizer was never fit to.

    Scale shape: one combinable token count, a TakeOrdered top-{_VOCAB_N}
    (never a full sort), broadcast of the {_VOCAB_N}-row vocab into a
    map-side left join, one grouped count per source."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokenize("text")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("tok"))
        .limit(_VOCAB_N)
        .select("tok", F.lit(1).alias("__in_v"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_if(F.col("__in_v").isNull()).cast("long").alias("n_oov"),
        F.round(
            F.count_if(F.col("__in_v").isNull()) / F.count(F.lit(1)).cast("double")
            * 100,
            6,
        ).alias("oov_pct"),
    )


@register(
    "sentence_stats",
    oracle=rf"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(text, '{_SENT_RE}'),
               x -> trim(x)), x -> x != '') AS sents
      FROM documents
    )
    SELECT doc_id,
           len(sents)::BIGINT AS n_sentences,
           coalesce(list_sum(list_transform(sents, x -> length(x))), 0)::BIGINT
             AS sent_chars,
           round(CASE WHEN len(sents) > 0
                 THEN list_sum(list_transform(sents, x -> length(x)))
                      / len(sents)::DOUBLE END, 6) AS mean_sent_len
    FROM s
    """,
)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (lookaround-free terminal-punctuation
    chunking — the same RE2-safe pattern in both engines) with per-doc
    counts and mean sentence length — the unit pass sentence-level
    dedup/chunking builds on. Map-only."""
    docs = read_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all("text", F.lit(_SENT_RE), F.lit(0)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    out = docs.withColumn("__s", sents)
    chars = F.aggregate(
        F.col("__s"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n = F.size("__s")
    return out.select(
        "doc_id",
        n.cast("long").alias("n_sentences"),
        F.coalesce(chars, F.lit(0)).cast("long").alias("sent_chars"),
        F.round(F.when(n > 0, chars / n), 6).alias("mean_sent_len"),
    )


@register(
    "props_key_profile",
    oracle="""
    WITH kv AS (
      SELECT k.key AS key,
             json_extract_string(e.props, '$.' || k.key) AS val
      FROM events e, unnest(json_keys(e.props)) AS k(key)
      WHERE e.props IS NOT NULL
    )
    SELECT key, count(*)::BIGINT AS n,
           count(DISTINCT val)::BIGINT AS n_distinct,
           min(val) AS min_val, max(val) AS max_val
    FROM kv GROUP BY 1
    """,
)
def q_props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured observability: which keys the event props JSON
    payload actually carries, with per-key occurrence and distinct/
    min/max value stats (string domain — the report for a column the
    warehouse treats as opaque). Map-side key explode + one grouped
    aggregate; min/max on the extracted string give cheap domain
    bounds without parsing types."""
    ev = read_table(spark, sf_dir, "events")
    kv = ev.where(F.col("props").isNotNull()).select(
        F.explode(F.json_object_keys("props")).alias("key"),
        F.col("props").alias("__p"),
    ).select(
        "key",
        F.expr("get_json_object(__p, concat('$.', key))").alias("__v"),
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("__v").cast("long").alias("n_distinct"),
        F.min("__v").alias("min_val"),
        F.max("__v").alias("max_val"),
    )
