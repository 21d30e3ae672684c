"""Registry batch 70 — code-switch detection: per-sentence language
guesses against the document-level guess (the mixed-language screen a
per-language corpus pipeline runs before routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.registry61 import _SENT_RE
from datas_spark.registry_core import register


def _lang_counts_sql(col: str) -> dict[str, str]:
    return {
        lang: (
            rf"len(list_filter(string_split_regex(trim({col}), '\s+'), "
            f"t -> lower(t) IN ({', '.join(repr(s) for s in stops)})))"
        )
        for lang, stops in T._STOPWORDS.items()
    }


def _guess_sql(col: str) -> str:
    c = _lang_counts_sql(col)
    g = f"greatest({c['en']}, {c['es']}, {c['fr']}, {c['de']})"
    return f"""CASE WHEN {g} = 0 THEN 'und'
           WHEN {c['en']} = {g} THEN 'en'
           WHEN {c['es']} = {g} THEN 'es'
           WHEN {c['fr']} = {g} THEN 'fr'
           ELSE 'de' END"""


@register(
    "code_switch_stats",
    oracle=rf"""
    WITH sents AS (
      SELECT doc_id, unnest(list_filter(list_transform(
               regexp_extract_all(text, '{_SENT_RE}'),
               x -> trim(x)), x -> x != '')) AS sent
      FROM documents
    ), sl AS (
      SELECT doc_id, {_guess_sql('sent')} AS s_lang FROM sents
    ), dl AS (
      SELECT doc_id, {_guess_sql('text')} AS d_lang FROM documents
    )
    SELECT d.doc_id, dl.d_lang AS doc_lang,
           count(sl.s_lang)::BIGINT AS n_sentences,
           count(*) FILTER (sl.s_lang IS NOT NULL AND sl.s_lang != 'und'
                            AND sl.s_lang != dl.d_lang)::BIGINT AS n_switched,
           round(CASE WHEN count(sl.s_lang) > 0
                 THEN count(*) FILTER (sl.s_lang IS NOT NULL
                      AND sl.s_lang != 'und' AND sl.s_lang != dl.d_lang)
                      / count(sl.s_lang)::DOUBLE ELSE 0.0 END, 6) AS switch_frac
    FROM documents d
    JOIN dl USING (doc_id)
    LEFT JOIN sl ON sl.doc_id = d.doc_id
    GROUP BY d.doc_id, dl.d_lang
    """,
)
def q_code_switch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc code-switching: fraction of sentences whose detected
    language differs from the document-level guess ('und' sentences
    don't count as switches). Sentence split + per-sentence stopword
    vote, all map-side; one grouped count per doc."""
    docs = read_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all("text", F.lit(_SENT_RE), F.lit(0)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    doc_lang = docs.select("doc_id", T.language_id("text").alias("doc_lang"))
    per_sent = (
        docs.select("doc_id", F.explode_outer(sents).alias("__sent"))
        .where(F.col("__sent").isNotNull())
        .select("doc_id", T.language_id(F.col("__sent")).alias("s_lang"))
    )
    agg = per_sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.collect_list("s_lang").alias("__langs"),
    )
    joined = doc_lang.join(agg, "doc_id", "left")
    switched = F.size(
        F.filter(
            F.coalesce("__langs", F.array().cast("array<string>")),
            lambda x: (x != "und") & (x != F.col("doc_lang")),
        )
    ).cast("long")
    return joined.select(
        "doc_id",
        "doc_lang",
        F.coalesce("n_sentences", F.lit(0)).cast("long").alias("n_sentences"),
        switched.alias("n_switched"),
        F.round(
            F.when(
                F.coalesce("n_sentences", F.lit(0)) > 0,
                switched / F.col("n_sentences").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("switch_frac"),
    )
