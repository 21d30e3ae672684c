"""ROUGE-L novelty filtering against an instruction pool — the
Self-Instruct admission rule (Wang et al. 2022: a generated
instruction joins the pool only if its ROUGE-L similarity to every
existing instruction is below 0.7). The engine's instruction-data
counterpart to `doc_novelty_rate` (which gates on n-gram novelty):
here similarity is the longest common SUBSEQUENCE of token sequences,
which catches re-orderings and insertions n-gram overlap misses.

Core identity: with β=1, ROUGE-L F = 2·P·R/(P+R) collapses to

    F(c, r) = 2·LCS(c, r) / (|c| + |r|)

— one exact-integer LCS + one division per (candidate, reference)
pair, so the max over the pool is engine-exact.

Scale contract: the POOL is small by construction (Self-Instruct
compares against the curated seed/accepted pool, not the corpus) —
it packs into ONE broadcast row of token arrays and the whole filter
is a map-only fold per candidate: |pool|·max_tokens² integer DP cells
per row, zero shuffles, zero driver collects. Token sequences
truncate to ``max_tokens`` (the MaxSim/unigram budget discipline —
the truncation IS the documented bound that keeps the DP and its
unrolled SQL twin finite).

The LCS runs as the classic rolling-row DP expressed as nested HOF
folds (the `unigram` Viterbi discipline): outer fold over candidate
tokens, inner fold building each row left-to-right. The SQL twin
unrolls both dimensions (12×12 scalar cells via DuckDB lateral
column aliases) — see registry_corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from datas_spark.functions.text import word_tokens

__all__ = ["rouge_l_novelty"]


def _toks(text: Column, max_tokens: int) -> Column:
    return F.slice(
        F.filter(
            F.transform(word_tokens(text), lambda w: F.lower(w)),
            lambda w: F.length(w) > 0,
        ),
        1,
        max_tokens,
    )


def _lcs(a: Column, b: Column) -> Column:
    """Exact LCS length of two token arrays via the rolling-row DP:
    outer fold over ``a``'s tokens, inner fold over positions of ``b``
    building the new row left-to-right (new[j] = prev[j-1]+1 on match,
    else max(prev[j], new[j-1])). All-integer — engine-exact."""

    def outer_step(prev, x):
        def inner_step(row, j):
            match = x == F.element_at(b, j)
            cell = F.when(match, F.element_at(prev, j) + 1).otherwise(
                F.greatest(
                    F.element_at(prev, j + 1), F.element_at(row, -1)
                )
            )
            return F.concat(row, F.array(cell))

        return F.aggregate(
            F.sequence(F.lit(1), F.size(b)),
            F.array(F.lit(0)),
            inner_step,
        )

    init = F.transform(
        F.sequence(F.lit(0), F.size(b)), lambda _i: F.lit(0)
    )
    return F.element_at(F.aggregate(a, init, outer_step), -1)


def rouge_l_novelty(
    candidates: DataFrame,
    pool: DataFrame,
    id_col: str,
    text_col: str,
    pool_text_col: str | None = None,
    max_tokens: int = 12,
    threshold: float = 0.7,
) -> DataFrame:
    """Label every candidate with its maximum ROUGE-L F against the
    pool: ``(id_col, max_rouge_l double, keep boolean)`` — ``keep``
    iff max < ``threshold`` (the Self-Instruct admission rule; a
    candidate identical to a pool member scores 1.0 and drops).
    Empty-token candidates score 0 against everything (vacuously
    novel). ``pool`` must be contract-small (it broadcasts packed
    into one row)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    ptc = pool_text_col or text_col
    packed = pool.select(_toks(F.col(ptc), max_tokens).alias("__r")).agg(
        F.collect_list("__r").alias("__refs")
    )
    a = _toks(F.col(text_col), max_tokens)
    base = candidates.select(F.col(id_col), a.alias("__a")).crossJoin(
        broadcast(packed)
    )
    fscore = lambda ref: F.when(  # noqa: E731
        (F.size(F.col("__a")) > 0) & (F.size(ref) > 0),
        F.lit(2.0)
        * _lcs(F.col("__a"), ref).cast("double")
        / (F.size(F.col("__a")) + F.size(ref)).cast("double"),
    ).otherwise(F.lit(0.0))
    mx = F.coalesce(
        F.array_max(F.transform(F.col("__refs"), fscore)), F.lit(0.0)
    )
    return base.select(
        F.col(id_col),
        F.round(mx, 6).alias("max_rouge_l"),
        (F.round(mx, 6) < F.lit(float(threshold))).alias("keep"),
    )
