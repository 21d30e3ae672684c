"""Registry batch 38 — DSIR importance weighting: the
importance-resampling data-selection signal (Xie et al. 2023) that
tilts a raw crawl toward a trusted target slice. A flagship curation
operator alongside the quality/LM/contamination family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.corpus import dsir_importance
from datas_spark.registry_core import register


@register(
    "dsir_importance_weights",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, (source IN ('src0', 'src1')) AS tgt,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), ct AS (
      SELECT t, count(*)::BIGINT AS ct FROM toks WHERE tgt GROUP BY 1
    ), cr AS (
      SELECT t, count(*)::BIGINT AS cr FROM toks GROUP BY 1
    ), vocab AS (
      SELECT cr.t, coalesce(ct.ct, 0)::BIGINT AS ct, cr.cr
      FROM cr LEFT JOIN ct USING (t)
    ), scal AS (
      SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr,
             count(*)::BIGINT AS v
      FROM vocab
    ), ratio AS (
      SELECT v.t,
             ln((v.ct + 1)::DOUBLE / (s.nt + s.v)::DOUBLE)
           - ln((v.cr + 1)::DOUBLE / (s.nr + s.v)::DOUBLE) AS lr
      FROM vocab v CROSS JOIN scal s
    ), scored AS (
      SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
             round(sum(r.lr), 6) AS dsir_weight
      FROM toks tk JOIN ratio r USING (t) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           s.dsir_weight
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against a trusted target slice (sources
    src0/src1 stand in for the curated domain): every document scores
    Σ log(p_target/p_raw) over its unigrams with add-one smoothing —
    positive = more target-like than the corpus average. Sampling
    ∝ exp(weight) is the importance-resampling recipe for domain
    tilting at crawl scale.

    One tokenize pass feeds the hashed count frames AND the scoring
    explode; both smoothing scalars broadcast from a 1-row aggregate;
    the token-key join is the only real shuffle. The DuckDB twin
    retrains on string tokens — identical counts, identical weights."""
    docs = read_table(spark, sf_dir, "documents")
    return dsir_importance(
        docs, "doc_id", "text", F.col("source").isin("src0", "src1")
    )
