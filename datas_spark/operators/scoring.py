"""Scorer operators (SURVEY §2.2) — the reference's scorer family as
DataFrame transforms.

Model-backed scorers (P4 reward-model, P5 perplexity, P6 conditional
perplexity, P11 LLM judges) sit behind the ``Scorer`` protocol: the
relational skeleton (prompt templating, array math, filtering) is pure
Column expressions, and only the model forward pass is a pandas_udf.
For tests/oracle runs a **deterministic md5-based proxy** replaces the
model — computed inside a real Arrow-batched pandas_udf so the
execution path (Arrow transfer, batch shapes) is the production one,
while values stay reproducible in DuckDB SQL:

    proxy_score(s) = int(md5(s)[:8], 16) / 2^32   ∈ [0, 1)

Real HF-model scorers plug in the same shape (iterator pandas_udf,
model loaded once per executor) — see ``make_model_scorer``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from datas_spark.functions.arrays import arr_mean
from datas_spark.functions.text import alpaca_prompt, length_score, whole_text

__all__ = [
    "proxy_score_udf",
    "hash_unit_interval",
    "length_scorer",
    "reward_scorer_proxy",
    "perplexity_scorer_proxy",
    "ifd_from_losses",
    "token_span_slice",
    "lp_score",
    "less_scorer_stub",
    "with_scores_map",
    "make_model_scorer",
    "make_token_loss_scorer",
    "fake_causal_lm_factory",
    "ifd_model_scorer",
    "make_grad_capture",
    "grad_capture_long",
    "less_influence",
]


def _md5_unit(s: str) -> float:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) / 2**32


@F.pandas_udf(DoubleType())
def proxy_score_udf(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for a model forward pass, on the real
    Arrow-batched pandas_udf path. Matches the SQL expression
    ``('0x' || substr(md5(s),1,8))::BIGINT / 4294967296.0``."""
    return texts.map(lambda s: _md5_unit(s if s is not None else ""))


def hash_unit_interval(col: Column | str) -> Column:
    """Same proxy as a native Column expression (for plans where the
    pandas_udf boundary isn't wanted)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("double") / F.lit(2.0**32)


def length_scorer(df: DataFrame, output_col: str = "output") -> DataFrame:
    """P2 (score_pipeline_lenth.py:35-38): ``lenth`` = len(output).
    NB the reference *discards* its mapped result (:41-42 bug); we
    return the scored frame."""
    return df.withColumn("lenth", length_score(output_col).cast("long"))


def reward_scorer_proxy(
    df: DataFrame,
    instruction_col: str = "instruction",
    input_col: str = "input",
    output_col: str = "output",
) -> DataFrame:
    """P4 (score_pipeline_rw.py:39-52): cross-encoder reward on
    (prompt, output) → ``score_rw``. Proxy scores md5(prompt||output);
    the real deberta cross-encoder plugs in via make_model_scorer."""
    text = F.concat(alpaca_prompt(instruction_col, input_col), F.col(output_col))
    return df.withColumn("score_rw", proxy_score_udf(text))


def perplexity_scorer_proxy(
    df: DataFrame,
    instruction_col: str = "instruction",
    input_col: str = "input",
    out_col: str = "ppl_ins_alone",
) -> DataFrame:
    """P5 (get_info.py:69-83, main.py:229-231): prompt-only perplexity.
    Proxy: 1 + 99·unit_hash(prompt) ∈ [1, 100) — positive, ppl-shaped."""
    prompt = alpaca_prompt(instruction_col, input_col)
    return df.withColumn(out_col, F.lit(1.0) + F.lit(99.0) * hash_unit_interval(prompt))


def token_span_slice(loss_col: Column | str, start: Column | int, length: Column | int) -> Column:
    """P7 (score_pipeline_ifd.py:105-116): slice the per-token loss list
    to the answer span — ``F.slice`` once offsets are columns."""
    return F.slice(
        F.col(loss_col) if isinstance(loss_col, str) else loss_col, start, length
    )


def ifd_from_losses(
    df: DataFrame,
    loss_cond_col: str,
    loss_alone_col: str,
    max_ratio: float = 1.0,
) -> DataFrame:
    """P8 (score_pipeline_ifd.py:120-219): ``score_ifd`` =
    mean(loss_cond)/mean(loss_alone); rows with empty arrays or ratio >
    ``max_ratio`` are dropped — the reference's silent skip (:193-204)
    as an explicit filter."""
    out = df.withColumn(
        "score_ifd", arr_mean(loss_cond_col) / arr_mean(loss_alone_col)
    )
    return out.where(
        F.col("score_ifd").isNotNull() & (F.col("score_ifd") <= max_ratio)
    )


def ifd_scorer_proxy(df: DataFrame) -> DataFrame:
    """P6+P8 composed, model replaced by the deterministic proxy: build
    per-token loss arrays for the answer alone vs conditioned on the
    prompt (score_pipeline_ifd.py:129-155 shape), then the IFD ratio +
    drop filter. The token→loss map is a pure expression; swap
    ``make_model_scorer`` in for real NLL lists."""
    words = F.split(F.trim(F.col("output")), r"\s+")
    loss_alone = F.transform(
        words, lambda w: ((F.length(w) * 7 + 3) % 11) / F.lit(10.0) + 0.1
    )
    loss_cond = F.transform(
        words, lambda w: ((F.length(w) * 5 + 1) % 11) / F.lit(10.0) + 0.05
    )
    staged = df.withColumn("__la", loss_alone).withColumn("__lc", loss_cond)
    return ifd_from_losses(staged, "__lc", "__la").drop("__la", "__lc")


def lp_score(df: DataFrame, ppl_cols: list[str], out_col: str = "score_lp") -> DataFrame:
    """P10 (paper_list.md:44-46): learning percentage
    ``LP(1) = (P1 − P0) / (P0 − Pn)`` over per-epoch perplexity columns
    [P0, P1, ..., Pn]. NULL when the denominator is 0."""
    p0, p1, pn = F.col(ppl_cols[0]), F.col(ppl_cols[1]), F.col(ppl_cols[-1])
    denom = p0 - pn
    return df.withColumn(out_col, F.when(denom != 0, (p1 - p0) / denom))


def less_scorer_stub(df: DataFrame, output_col: str = "output") -> DataFrame:
    """P9 (score_pipeline_less.py:54-57): the reference ships a stub —
    gradient-influence selection docstring, ``len(output)`` body. We
    mirror the documented placeholder; the real design is a grad-capture
    pandas_udf → long param table → dot-product join vs target grads
    (get_info.py:43-68, zip_with+aggregate)."""
    return df.withColumn("less_score", length_score(output_col).cast("double"))


def with_scores_map(df: DataFrame, score_cols: list[str], out_col: str = "scores") -> DataFrame:
    """README.md:35-38 envisions a multi-scorer ``scores`` dict; we keep
    one column per scorer (prunable, oracle-checkable — SURVEY §1.4)
    and offer the map view for API parity."""
    kv = []
    for c in score_cols:
        kv += [F.lit(c), F.col(c).cast("double")]
    return df.withColumn(out_col, F.create_map(*kv))


def make_model_scorer(
    model_fn_factory: Callable[[], Callable[[pd.Series], pd.Series]],
) -> Callable[[Column], Column]:
    """Build an iterator-style pandas_udf scorer that loads a model ONCE
    per executor python worker (the Spark equivalent of the reference's
    process-global model at score_pipeline_ifd.py:54-57) and scores
    Arrow batches.

    ``model_fn_factory`` runs on the executor: returns a closure
    (pd.Series of texts → pd.Series of scores). Real HF models are not
    installed in this container — callers pass a factory that raises
    NotImplementedError, or a deterministic fake for tests.
    """

    @F.pandas_udf(DoubleType())
    def scorer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model_fn = model_fn_factory()  # once per worker, not per batch
        for batch in batches:
            yield model_fn(batch)

    return scorer


def make_token_loss_scorer(
    model_fn_factory: Callable[[], Callable[[str, str], list[float]]],
) -> Callable[[Column, Column], Column]:
    """The model boundary of the IFD pipeline (score_pipeline_ifd.py:
    78-116): given (context, text), a causal LM returns the per-token
    NLL list for ``text`` conditioned on ``context`` (empty context =
    the 'alone' pass). Iterator pandas_udf over (context, text) column
    pairs; the factory runs once per executor python worker — the Spark
    twin of the reference's process-global model load (:54-57).

    Returns a 2-arg column function producing ``array<double>``.
    """
    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(DoubleType()))
    def scorer(
        batches: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        model_fn = model_fn_factory()  # once per worker, not per batch
        for ctx, txt in batches:
            yield pd.Series(
                [
                    model_fn(c if c is not None else "", t if t is not None else "")
                    for c, t in zip(ctx, txt)
                ]
            )

    return scorer


def fake_causal_lm_factory() -> Callable[[str, str], list[float]]:
    """Deterministic stand-in with a real causal LM's lifecycle and
    signature: 'loads' its state once (per executor worker, via
    make_token_loss_scorer), then maps (context, text) → per-token NLL
    list. Token loss = md5_unit(context + '#' + token): context-
    dependent like a real conditional NLL, and bit-reproducible in
    DuckDB SQL so the whole pipeline stays oracle-checkable.

    Tokenization matches ``split(trim(text), '\\s+')`` (the engine-side
    word_tokens / DuckDB string_split_regex convention — an empty text
    yields one empty token, never an empty list).
    """
    import re

    vocab_salt = "#"  # the 'loaded weights' of the fake model

    def nll(context: str, text: str) -> list[float]:
        toks = re.split(r"\s+", text.strip())
        return [_md5_unit(context + vocab_salt + w) for w in toks]

    return nll


def ifd_model_scorer(
    df: DataFrame,
    instruction_col: str = "instruction",
    input_col: str = "input",
    output_col: str = "output",
    model_fn_factory: Callable[[], Callable[[str, str], list[float]]] | None = None,
    max_ratio: float = 1.0,
) -> DataFrame:
    """P6+P8 end-to-end THROUGH the model boundary (score_pipeline_ifd.
    py:78-219): two conditional-NLL passes over the pandas_udf path —
    loss(output | prompt) and loss(output | ∅) — then the IFD ratio and
    drop filter. Default model is the deterministic fake; swap an HF
    causal LM factory in production (identical closure signature)."""
    scorer = make_token_loss_scorer(model_fn_factory or fake_causal_lm_factory)
    prompt = alpaca_prompt(instruction_col, input_col)
    staged = df.withColumn("__lc", scorer(prompt, F.col(output_col))).withColumn(
        "__la", scorer(F.lit(""), F.col(output_col))
    )
    return ifd_from_losses(staged, "__lc", "__la", max_ratio).drop("__la", "__lc")


# ---------------------------------------------------------------------------
# T12 + P9 end-to-end: gradient capture -> long param table -> LESS
# influence (the one reference dataflow previously pattern-only here)
# ---------------------------------------------------------------------------

def make_grad_capture(
    params: list[str],
    dim: int,
    grad_fn_factory: Callable[[], Callable[[str], list[float]]] | None = None,
):
    """T12 (``/root/reference/src/utils/get_info.py:43-68``): per-example
    gradient capture as an iterator pandas_udf. The model loads once per
    executor python worker; each text maps to a flat
    ``len(params) * dim`` gradient vector (the LoRA-projected gradient
    of LESS — real trainers project the full gradient down before
    shipping it anywhere, so ``dim`` is small by construction).

    Default factory is the deterministic fake
    ``grad[p][j] = 2 * md5_unit(text + '#' + param + '#' + j) - 1``,
    bit-reproducible in DuckDB SQL so the downstream relational math is
    oracle-checkable; a real factory closes over torch and returns
    per-example projected grads with the identical signature.
    """
    from pyspark.sql.types import ArrayType

    def default_factory() -> Callable[[str], list[float]]:
        def grads(text: str) -> list[float]:
            return [
                2.0 * _md5_unit(f"{text}#{p}#{j}") - 1.0
                for p in params
                for j in range(dim)
            ]

        return grads

    factory = grad_fn_factory or default_factory

    @F.pandas_udf(ArrayType(DoubleType()))
    def capture(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        grad_fn = factory()  # once per worker, not per batch
        for batch in batches:
            yield pd.Series([grad_fn(t if t is not None else "") for t in batch])

    return capture


def grad_capture_long(
    df: DataFrame,
    id_col: str,
    text_col: str,
    params: list[str],
    dim: int,
    grad_fn_factory: Callable[[], Callable[[str], list[float]]] | None = None,
) -> DataFrame:
    """Capture per-example gradients into the LONG parameter layout
    ``(id, param, idx, value)`` — the same relational model the
    task-vector algebra uses (SURVEY §2.7), so influence scoring,
    merging, and per-parameter analytics are all joins/aggregates.

    One pandas_udf call per example (batched via Arrow), one
    ``posexplode`` — the flat position maps back to (param, idx)
    arithmetically, no shuffle until the caller aggregates.
    """
    capture = make_grad_capture(params, dim, grad_fn_factory)
    flat = df.select(F.col(id_col), capture(F.col(text_col)).alias("__g"))
    param_arr = F.array(*[F.lit(p) for p in params])
    pe = flat.select(id_col, F.posexplode("__g").alias("__pos", "value"))
    return pe.select(
        F.col(id_col),
        F.get(param_arr, (F.col("__pos") / dim).cast("int")).alias("param"),
        (F.col("__pos") % dim).cast("long").alias("idx"),
        "value",
    )


def less_influence(
    train_grads: DataFrame,
    target_grads: DataFrame,
    id_col: str,
    out_col: str = "less_influence",
) -> DataFrame:
    """P9, the real dataflow the reference stubs
    (``score_pipeline_less.py:1-9`` docstring vs ``len(output)`` body):
    LESS influence = <example_grad, mean target-task grad>. Inputs are
    long ``(id, param, idx, value)`` tables from ``grad_capture_long``.

    Plan: the target side aggregates to ONE vector (|params| * dim rows
    — tiny, broadcast); the train side joins it map-side and reduces
    per example with a combinable sum. The 100 TB shape: no shuffle of
    the big gradient table beyond the per-example aggregation, and that
    carries one double per (example, partition).
    """
    from pyspark.sql.functions import broadcast

    tg = target_grads.groupBy("param", "idx").agg(F.avg("value").alias("__tv"))
    return (
        train_grads.join(broadcast(tg), ["param", "idx"])
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("value") * F.col("__tv")), 6).alias(out_col))
    )
