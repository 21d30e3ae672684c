"""Query registry, batch 4 (round 2): model-boundary e2e scoring, TIES
fidelity variants, vectorized near-dup, multi-probe LSH, skew-resistant
stride sampling.

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import scoring as SC
from datas_spark.registry_core import register

# ---------------------------------------------------------------------------
# P6+P8 through the REAL model boundary (iterator pandas_udf, per-worker
# model load) — deterministic fake causal LM, oracle-checkable
# ---------------------------------------------------------------------------

_MD5_UNIT = "('0x' || substr(md5({s}), 1, 8))::BIGINT / 4294967296.0"

_PROMPT_SQL = """'Below is an instruction that describes a task. Write a response that appropriately completes the request.

### Instruction:
' || substr(text, 1, 80) || '

### Response:'"""

_IFD_MODEL_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id, {_PROMPT_SQL} AS prompt,
             substr(text, 81, 60) AS output
      FROM documents
    ), l AS (
      SELECT doc_id,
        list_transform(string_split_regex(trim(output), '\s+'),
                       w -> {_MD5_UNIT.format(s="prompt || '#' || w")}) AS lc,
        list_transform(string_split_regex(trim(output), '\s+'),
                       w -> {_MD5_UNIT.format(s="'#' || w")}) AS la
      FROM t
    ), m AS (
      SELECT doc_id,
        list_sum(lc)::DOUBLE / len(lc) AS mc,
        list_sum(la)::DOUBLE / len(la) AS ma
      FROM l
    )
    SELECT doc_id, round(mc / ma, 6) AS score_ifd_model
    FROM m WHERE mc / ma <= 1.0
"""


@register("ifd_model_scorer", oracle=_IFD_MODEL_ORACLE)
def q_ifd_model_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P8 end-to-end through make_token_loss_scorer — the production
    execution path of score_pipeline_ifd.py:78-219 (iterator pandas_udf,
    model factory run once per worker, TWO conditional-NLL passes, IFD
    ratio + drop filter) with the deterministic fake causal LM standing
    in for the HF model."""
    docs = read_table(spark, sf_dir, "documents")
    pseudo = docs.select(
        "doc_id",
        F.substring("text", 1, 80).alias("instruction"),
        F.lit("").alias("input"),
        F.substring("text", 81, 60).alias("output"),
    )
    scored = SC.ifd_model_scorer(pseudo)
    return scored.select("doc_id", F.round("score_ifd", 6).alias("score_ifd_model"))


# ---------------------------------------------------------------------------
# TIES fidelity variants: whole-vector global top-k mask (the reference
# driver's actual flow) and minority zero-sign resolution
# ---------------------------------------------------------------------------

from datas_spark.operators import taskvector as TV  # noqa: E402
from datas_spark.registry2 import _TIES_K, _ties_oracle, _ties_tvs  # noqa: E402


@register("ties_merge_global", oracle=_ties_oracle(mask_partition="vector_id"))
def q_ties_merge_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIES with the top-20% mask over each WHOLE flattened checkpoint
    (merging.py:155-163 driver flow over get_taskV.py:20-36 flat
    vectors) instead of per matrix row."""
    return TV.ties_merge(
        _ties_tvs(spark, sf_dir), k_pct=_TIES_K, mode="mean", global_topk=True
    )


@register(
    "ties_merge_minority",
    oracle=_ties_oracle(
        zero_fallback="coalesce(-(SELECT g FROM gmaj), -1)"
    ),
)
def q_ties_merge_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIES with minority zero-sign resolution (merging.py:231-232):
    zero-sum entries inherit the NEGATED global majority sign."""
    return TV.ties_merge(
        _ties_tvs(spark, sf_dir),
        k_pct=_TIES_K,
        mode="mean",
        row_size=1024,
        sign_method="minority",
    )
