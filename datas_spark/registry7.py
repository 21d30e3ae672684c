r"""Query registry, batch 7 (round 3): the extended curation recipe
(PII redaction + paragraph dedup + near-dup election inside
``pipeline.curate.curate_corpus``), LESS-style gradient influence, and
skew-hardened variants.

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry import register
from datas_spark.registry5 import _MD5_UNIT_SQL, _NORM_SQL
from datas_spark.registry6 import _AUG_SQL, _EMAIL, _IP, _PHONE, _augment_pii

# ---------------------------------------------------------------------------
# curate_corpus_full — the recipe stages the basic curate_corpus query
# does not exercise (redaction, paragraph dedup, near-dup election),
# chained in ONE plan and hash-checked end-to-end. Between the two
# registered curation queries every stage of the recipe is oracle-
# covered in composition, not just in isolation.
# ---------------------------------------------------------------------------

_CURATE_FULL_ORACLE = rf"""
    WITH RECURSIVE aug AS ({_AUG_SQL}),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                 '{_PHONE}', '<PHONE>', 'g'),
               '{_IP}', '<IP>', 'g') AS text
      FROM aug
    ), ded AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, row_number() OVER (
          PARTITION BY md5({_NORM_SQL.format(t='text')})
          ORDER BY doc_id) AS rn
        FROM red
      ) WHERE rn = 1
    ), seg AS (
      SELECT doc_id, string_split_regex(text, ' table ') AS parts FROM ded
    ), p0 AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(parts) + 1),
          i -> {{'pos': i - 1, 'para': trim(parts[i])}})) AS u
      FROM seg
    ), p AS (
      SELECT doc_id, u.pos AS pos, u.para AS para FROM p0
    ), el AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p WHERE length(para) >= 1
    ), kept AS (
      SELECT doc_id, pos, para FROM p WHERE length(para) < 1
      UNION ALL
      SELECT doc_id, pos, para FROM el WHERE rn = 1
    ), rebuilt AS (
      SELECT d.doc_id, coalesce(a.txt, '') AS text
      FROM ded d LEFT JOIN (
        SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS txt
        FROM kept GROUP BY doc_id
      ) a USING (doc_id)
    ), sh2 AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM rebuilt
    ), ex2 AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh2
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex2 a JOIN ex2 b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), ee AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT a, a FROM ee
      UNION
      SELECT ee.a, reach.r FROM ee JOIN reach ON reach.node = ee.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT rb.doc_id, length(rb.text) AS sc,
             coalesce(comp.component, rb.doc_id) AS component
      FROM rebuilt rb LEFT JOIN comp ON rb.doc_id = comp.node
    ), best AS (
      SELECT component, doc_id AS keep_id FROM (
        SELECT component, doc_id,
               row_number() OVER (PARTITION BY component
                                  ORDER BY sc DESC, doc_id ASC) AS rn
        FROM labeled
      ) WHERE rn = 1
    )
    SELECT l.doc_id, l.component,
           CASE WHEN {_MD5_UNIT_SQL.format(key="l.doc_id::VARCHAR")} < 0.8
                THEN 'train' ELSE 'test' END AS split
    FROM labeled l JOIN best b
      ON l.component = b.component AND b.keep_id = l.doc_id
"""


@register("curate_corpus_full", oracle=_CURATE_FULL_ORACLE)
def q_curate_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation stages the basic ``curate_corpus`` query leaves
    idle, composed and hash-checked: PII redaction (typed placeholders,
    BEFORE dedup so docs differing only in a phone number dedup
    together) -> exact dedup -> corpus-wide paragraph dedup on the
    ' table ' segment delimiter -> 3-gram-Jaccard near-dup components
    keeping the LONGEST doc per component -> deterministic 80/20
    split. Input is the PII-augmented corpus so redaction genuinely
    fires."""
    from datas_spark.pipeline.curate import curate_corpus

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = curate_corpus(
        _augment_pii(docs),
        max_dup_token_frac=1.0,
        max_top_bigram_frac=1.0,
        redact_pii=True,
        paragraph_dedup_delimiter=" table ",
        near_dup_threshold=0.2,
        split_weights={"train": 0.8, "test": 0.2},
    )
    return out.select("doc_id", "component", "split")
