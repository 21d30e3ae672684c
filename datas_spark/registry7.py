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
from datas_spark.registry_core import register
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


# ---------------------------------------------------------------------------
# less_influence — T12 gradient capture feeding P9 LESS influence, the
# one reference dataflow (get_info.py:43-68 -> score_pipeline_less.py)
# that was pattern-only until now. Gradients flow through the REAL
# iterator-pandas_udf boundary (deterministic md5 fake values), land in
# the long (id, param, idx, value) layout, and the influence is a
# broadcast dot-product join — all reproduced in the oracle.
# ---------------------------------------------------------------------------

_GRAD_PARAMS = ["layer0.proj", "layer1.proj"]
_GRAD_DIM = 4

_LESS_ORACLE = f"""
    WITH p AS (
      SELECT unnest([{', '.join(repr(p) for p in _GRAD_PARAMS)}]) AS param
    ), ix AS (
      SELECT unnest(range(0, {_GRAD_DIM})) AS idx
    ), g AS (
      SELECT d.doc_id, p.param, ix.idx,
        2.0 * {_MD5_UNIT_SQL.format(key="d.text || '#' || p.param || '#' || ix.idx")}
          - 1.0 AS value
      FROM documents d CROSS JOIN p CROSS JOIN ix
    ), tg AS (
      SELECT param, idx, avg(value) AS tv
      FROM g WHERE doc_id < 5 GROUP BY param, idx
    )
    SELECT g.doc_id, round(sum(g.value * tg.tv), 6) AS less_influence
    FROM g JOIN tg USING (param, idx)
    GROUP BY g.doc_id
"""


@register("less_influence", oracle=_LESS_ORACLE)
def q_less_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 + P9 end-to-end: per-example gradients captured through the
    iterator pandas_udf (deterministic fake, real Arrow path) into the
    long param table, target-task gradient averaged from the doc_id<5
    slice, influence = broadcast dot-product join per example. The
    reference stubs this whole flow (score_pipeline_less.py body is
    len(output)); here the relational half is hash-checked."""
    from datas_spark.operators.scoring import grad_capture_long, less_influence

    docs = read_table(spark, sf_dir, "documents")
    grads = grad_capture_long(docs, "doc_id", "text", _GRAD_PARAMS, _GRAD_DIM)
    target = grads.where(F.col("doc_id") < 5)
    return less_influence(grads, target, "doc_id")


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


# ---------------------------------------------------------------------------
# Skew-hardened sampling variants — IDENTICAL oracles to the window-path
# queries in registry5, so the driver proves the skew-resistant rank
# construction is a pure physical-plan change.
# ---------------------------------------------------------------------------

@register(
    "stratified_sample_skew",
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
def q_stratified_sample_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stratified_sample(skew_resistant=True): same 10% per-language
    sample as the window path (identical oracle), but ranked via the
    range-exchange construction — no window partitioned by the stratum
    key, so the dominant language (~44% of docs) spreads over many
    tasks."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return C.stratified_sample(docs, "lang", "doc_id", 0.1, skew_resistant=True)


@register(
    "source_quota_cap_skew",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents
    ) WHERE rk <= 15
    """,
)
def q_source_quota_cap_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source_quota_cap(skew_resistant=True): same first-15-per-source
    cap (identical oracle), skew-proof rank — the source big enough to
    need capping is exactly the one that would have serialized onto a
    single window task."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return C.source_quota_cap(docs, "source", "doc_id", 15, skew_resistant=True)


# ---------------------------------------------------------------------------
# pack_sequences_bpe — packing budgeted in SUBWORD counts from the
# pluggable tokenizer boundary (iterator pandas_udf, deterministic fake
# BPE: tokenize on word/punct boundaries, ceil(len/4) subwords per
# token). The oracle recomputes the same counts in SQL, so the whole
# boundary-crossing plan hash-checks.
# ---------------------------------------------------------------------------

@register(
    "pack_sequences_bpe",
    oracle=r"""
    WITH t AS (
      SELECT source, doc_id,
        coalesce(list_sum(list_transform(
          list_filter(
            string_split_regex(
              trim(regexp_replace(lower(text), '([^\w\s])', ' \1 ', 'g')),
              '\s+'),
            t -> t != ''),
          t -> ceil(length(t) / 4.0)::BIGINT)), 0)::BIGINT AS n_tokens
      FROM documents
    )
    SELECT source, doc_id, n_tokens,
      ((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - n_tokens) // 500)::BIGINT AS bin
    FROM t
    """,
)
def q_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing with subword budgets: token counts cross the
    real Arrow pandas_udf boundary (fake BPE, tokenizer loaded once per
    worker — a SentencePiece factory plugs in unchanged), then the
    per-source running-cumsum bin plan. Whitespace packing budgets
    mis-size bins by the subword expansion factor; this is the
    accounting a training-batch assembler actually needs."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents")
    return C.pack_sequences_tokenized(
        docs, "doc_id", "text", budget=500, shard_col="source"
    )
