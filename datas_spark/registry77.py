"""Registry batch 77 — readability scoring (Flesch–Kincaid grade with
the standard vowel-group syllable heuristic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry61 import _SENT_RE
from datas_spark.registry_core import register


@register(
    "readability_scores",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != ''))
          AS n_words,
        greatest(len(list_filter(list_transform(
          regexp_extract_all(text, '{_SENT_RE}'), x -> trim(x)), x -> x != '')), 1)
          AS n_sentences,
        list_sum(list_transform(string_split_regex(trim(text), '\s+'),
          w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
          AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words::BIGINT AS n_words,
           n_sentences::BIGINT AS n_sentences,
           n_syllables::BIGINT AS n_syllables,
           round(CASE WHEN n_words > 0
                 THEN 0.39 * (n_words / n_sentences::DOUBLE)
                      + 11.8 * (n_syllables / n_words::DOUBLE) - 15.59 END, 4)
             AS fk_grade
    FROM t
    """,
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid grade per doc (0.39·words/sentence +
    11.8·syllables/word − 15.59) with the standard vowel-group
    syllable heuristic (every word ≥ 1 syllable; sentence count
    floored at 1) — the readability feature quality filters band on.
    Map-only expressions, identical RE2-safe regexes in both
    engines."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    words = F.filter(toks, lambda x: x != "")
    n_words = F.size(words)
    sents = F.filter(
        F.transform(
            F.regexp_extract_all("text", F.lit(_SENT_RE), F.lit(0)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    n_sentences = F.greatest(F.size(sents), F.lit(1))
    n_syllables = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(F.lower(w), F.lit(r"[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ),
    )
    out = (
        docs.withColumn("n_words", n_words.cast("long"))
        .withColumn("n_sentences", n_sentences.cast("long"))
        .withColumn("n_syllables", n_syllables.cast("long"))
    )
    fk = (
        0.39 * (F.col("n_words") / F.col("n_sentences").cast("double"))
        + 11.8 * (F.col("n_syllables") / F.col("n_words").cast("double"))
        - 15.59
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.when(F.col("n_words") > 0, fk), 4).alias("fk_grade"),
    )
