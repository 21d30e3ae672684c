"""Byte-pair-encoding tokenizer TRAINING at corpus scale, plus merge
application — the "learn a tokenizer on your own data" step of an LLM
data pipeline (the reference scores with pre-trained tokenizers only;
this is a SURVEY §2.9 north-star addition alongside `corpus.
make_subword_counter`, which CONSUMES a trained tokenizer).

Algorithm (Sennrich et al. 2016, the word-frequency formulation):

1. Reduce the corpus to its word-frequency table — by Heaps' law the
   distinct-word table is orders of magnitude smaller than the corpus
   (the 100 TB corpus becomes a ~10^8-row table), and all subsequent
   rounds run on IT, never on the corpus again.
2. Each round: count symbol pairs weighted by word frequency
   (map-side-combinable sum over an exploded pair list), take the
   arg-max pair (TakeOrdered over the pair table, deterministic
   cnt-desc / pair-asc tie-break), and apply the merge to every word
   (a broadcast literal `replace` — left-to-right non-overlapping,
   which IS the BPE merge order).
3. The per-round driver round-trip is ONE row (the winning pair) —
   the same contractually-tiny collect as k-center's argmax. The word
   table is `localCheckpoint`ed per round so the plan stays flat
   across rounds (the connected-components discipline).

Words are represented as space-joined symbol strings ("h e l l o");
symbols never contain spaces, so plain `replace(s, "l l", "ll")` is
exact. No end-of-word marker is used (documented simplification — add
one by appending a sentinel symbol to the spaced string).

Determinism: every step is exact integer counting + lexicographic
tie-breaks, so the learned merge table is reproducible in ANSI SQL —
registry12 unrolls the rounds as chained CTEs and the driver
hash-checks the merge table against DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens

__all__ = ["word_freq_table", "learn_bpe_merges", "apply_bpe_merges", "bpe_token_counts"]


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """Word-frequency reduction: ``(word string, cnt bigint)`` over
    whitespace tokens. The one pass that touches the corpus."""
    return (
        df.select(F.explode(word_tokens(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _spaced(col: Column) -> Column:
    """'hello' -> 'h e l l o' (symbol string, one char per symbol)."""
    return F.concat_ws(" ", F.split(col, ""))


def _pairs(sym_col: Column) -> Column:
    """Adjacent symbol pairs of a spaced string, as 'a b' strings."""
    syms = F.split(sym_col, " ")
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.get(syms, i), F.get(syms, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 12
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    ``(step int, pair string, merged string, pair_count bigint)`` in
    learned order (step 1 = first, highest-frequency merge).

    Stops early if the vocabulary runs out of repeated pairs.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    # lazy checkpoints throughout (round 11): each round's top-pair
    # collect materializes (and persists) that round's words frame as
    # part of its own job, so the separate eager-checkpoint job per
    # round disappears — ~2x fewer driver-coordinated jobs for the
    # identical merge sequence
    words = (
        word_freq_table(df, text_col)
        .select(_spaced(F.col("word")).alias("s"), "cnt")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            words.select(F.explode(_pairs(F.col("s"))).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break  # nothing left worth merging
        pair, c = top[0]["pair"], int(top[0]["c"])
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, c))
        words = words.select(
            F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s"), "cnt"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step: int, pair: string, merged: string, pair_count: long"
    )


def apply_bpe_merges(text: Column, merges: list[str]) -> Column:
    """Tokenize ``text`` with a learned merge list (pair strings like
    'l l', applied in learned order): returns array<string> of BPE
    tokens. Pure map-side expression — the merge list is a broadcast
    literal chain of `replace`s per word, exactly the training-side
    application order."""
    def merge_word(w: Column) -> Column:
        s = _spaced(w)
        for pair in merges:
            s = F.replace(s, F.lit(pair), F.lit(pair.replace(" ", "")))
        return s

    words = word_tokens(text)
    return F.flatten(
        F.transform(
            F.filter(words, lambda w: F.length(w) > 0),
            lambda w: F.split(merge_word(w), " "),
        )
    )


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, merges: list[str]
) -> DataFrame:
    """Per-document BPE token counts under a learned merge list:
    ``(id_col, n_chars bigint, n_bpe_tokens bigint)`` — the
    compression-ratio view that tells you whether the learned vocab
    actually shortens YOUR corpus."""
    toks = apply_bpe_merges(F.col(text_col), merges)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    )
