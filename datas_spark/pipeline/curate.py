"""End-to-end corpus curation recipe — the standard LLM pre-training
data pipeline (dedup → quality filters → decontamination → mixture
rebalancing → split) composed from the individually oracle-checked
operators into ONE lazy DataFrame plan.

Stage order follows the usual cost gradient: cheap map-side filters
first (repetition, quality), the exact-dedup aggregate next, the
benchmark broadcast probe after that, and the mixture/ split hashing
last over the surviving minority. Catalyst fuses the map-side stages;
nothing materializes between steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datas_spark.functions.text import quality_score
from datas_spark.operators.corpus import (
    hash_split,
    ngram_contamination,
    repetition_stats,
    temperature_sample,
)
from datas_spark.operators.dedup import exact_dedup

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str | None = None,
    min_quality: float = 0.0,
    max_dup_token_frac: float = 0.95,
    max_top_bigram_frac: float = 0.95,
    contamination_min_shared: int = 5,
    temperature: float | None = None,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation recipe; returns the surviving rows of
    ``docs`` plus a ``split`` column when ``split_weights`` is given.

    Steps (each optional knob defaults to pass-through):
    1. repetition filter  — drop docs above the dup-token / top-bigram
       fractions (map-side, no shuffle)
    2. quality filter     — drop docs under ``min_quality`` (map-side)
    3. exact dedup        — normalized-text fingerprint, first id wins
    4. decontamination    — drop docs sharing ≥ ``contamination_min_shared``
       n-grams with ``benchmark`` (broadcast probe), if given
    5. temperature sample — rebalance ``domain_col`` mixture, if given
    6. hash split         — deterministic train/test labels, if given
    """
    out = docs
    rep = repetition_stats(out, id_col, text_col)
    keep = rep.where(
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    out = out.join(keep, id_col, "left_semi")
    if min_quality > 0.0:
        out = out.where(quality_score(text_col) >= min_quality)
    out = exact_dedup(out, text_col, id_col)
    if benchmark is not None:
        clean = (
            ngram_contamination(
                out, benchmark, id_col, text_col, min_shared=contamination_min_shared
            )
            .where(F.col("contaminated") == 0)
            .select(id_col)
        )
        out = out.join(clean, id_col, "left_semi")
    if temperature is not None and domain_col is not None:
        out = temperature_sample(out, domain_col, id_col, temperature)
    if split_weights:
        out = hash_split(out, id_col, split_weights)
    return out
