"""ShareGPT multi-turn conversations (SURVEY §1.2).

The reference declares the sharegpt format as data
(``/root/reference/data/rawdata/readme.md:12-24``, sample
``sharegpt_simple.jsonl``) with support marked "later"
(``src/pipeline/base.py:28``):

    conversation_id: string, category: string,
    conversation: array<struct<human: string, assistant: string>>

We implement the two transforms every downstream scorer needs:

- ``flatten_conversations``: one row per turn via ``posexplode`` —
  keeps (conversation_id, turn, human, assistant). Map-side only, no
  shuffle; turn order is the array order (stable, oracle-checkable).
- ``turns_to_alpaca``: project flattened turns onto the alpaca schema
  (instruction=human, input="", output=assistant) so the entire scorer
  family (SURVEY §2.2) applies unchanged to multi-turn data.

Scale note: a conversation row is wide (whole dialog in one cell);
flattening FIRST and scoring per-turn keeps downstream shuffles on
small rows. The inverse (grouping turns back) is
``collect_list(struct(turn, ...))`` over conversation_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "flatten_conversations",
    "turns_to_alpaca",
    "regroup_turns",
    "conversation_text",
    "conversation_dedup",
    "conversation_stats",
    "conversation_format_check",
    "chat_training_pairs",
]


def flatten_conversations(
    df: DataFrame,
    conv_col: str = "conversation",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """One row per dialog turn: (``*id_cols``, turn, human, assistant).

    ``posexplode`` preserves the turn index; ``_outer`` + isNotNull on
    the generated column avoids InferFiltersFromGenerate cloning the
    conversation expression into a pushed-down filter (see dedup.py).
    """
    id_cols = id_cols or ["conversation_id"]
    exploded = df.select(
        *id_cols, F.posexplode_outer(conv_col).alias("turn", "__t")
    ).where(F.col("__t").isNotNull())
    return exploded.select(
        *id_cols,
        "turn",
        F.col("__t.human").alias("human"),
        F.col("__t.assistant").alias("assistant"),
    )


def turns_to_alpaca(turns: DataFrame) -> DataFrame:
    """Project flattened turns onto the alpaca scorer schema
    (instruction, input, output) — multi-turn data then flows through
    every §2.2 scorer unchanged."""
    return turns.withColumns(
        {
            "instruction": F.col("human"),
            "input": F.lit(""),
            "output": F.col("assistant"),
        }
    )


def regroup_turns(
    turns: DataFrame,
    id_cols: list[str] | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Inverse of ``flatten_conversations``: rebuild the conversation
    array (turn-ordered) per id, carrying optional per-turn score
    columns inside the struct."""
    id_cols = id_cols or ["conversation_id"]
    extra = extra_cols or []
    turn_struct = F.struct("turn", "human", "assistant", *extra)
    return (
        turns.groupBy(*id_cols)
        .agg(F.array_sort(F.collect_list(turn_struct)).alias("conversation"))
        .withColumn(
            "conversation",
            F.transform(
                "conversation",
                lambda t: F.struct(
                    t["human"].alias("human"),
                    t["assistant"].alias("assistant"),
                    *[t[c].alias(c) for c in extra],
                ),
            ),
        )
    )


def conversation_text(conv_col: str | Column) -> Column:
    """Flatten a conversation's turns to one text blob (human and
    assistant sides joined in turn order) — the canonical text for
    conversation-level dedup/fingerprinting."""
    c = F.col(conv_col) if isinstance(conv_col, str) else conv_col
    return F.array_join(
        F.transform(c, lambda t: F.concat_ws(" ", t["human"], t["assistant"])), " "
    )


def conversation_dedup(df: DataFrame, conv_col: str, order_col: str) -> DataFrame:
    """Exact dedup of whole conversations on the NORMALIZED flattened
    text (reposted chats differ in whitespace/punctuation, not words) —
    the multi-turn twin of document ``exact_dedup``, same map-side
    ``min_by`` election on a 64-bit key; turn arrays never shuffle.
    """
    from datas_spark.functions.text import normalized_text

    cols = df.columns
    fp = F.xxhash64(normalized_text(conversation_text(conv_col)))
    surv = (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min_by(F.struct(*cols), F.col(order_col)).alias("__row"))
    )
    return surv.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def conversation_stats(df: DataFrame, conv_col: str, id_col: str) -> DataFrame:
    """Per-conversation shape stats (turn count, per-side character
    mass, mean human-turn length) — the filter inputs of multi-turn SFT
    curation (drop monologues, truncated chats, assistant-only spam).
    Pure array expressions, map-only.
    """
    c = F.col(conv_col)
    h_chars = F.aggregate(
        c, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(F.coalesce(t["human"], F.lit(""))),
    )
    a_chars = F.aggregate(
        c, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(F.coalesce(t["assistant"], F.lit(""))),
    )
    n = F.size(c)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_turns"),
        h_chars.alias("human_chars"),
        a_chars.alias("assistant_chars"),
        F.when(n > 0, F.round(h_chars / n, 4)).alias("avg_human_chars"),
    )


def conversation_format_check(
    df: DataFrame,
    conv_col: str = "conversation",
    id_col: str = "conversation_id",
) -> DataFrame:
    """Structural format gate for dialog rows — the conversation-level
    extension of the reference's format check (``src/pipeline/
    base.py:28``): per conversation, the turn count, how many turns
    have an empty/NULL human or assistant side, and a ``format_ok``
    verdict (at least one turn, no empty side anywhere). Run it before
    turn-level scoring; route failures with `validate.quarantine`.

    Pure map-side higher-order functions over the conversation array —
    no explode, no shuffle; the array is traversed once per predicate.
    """
    conv = F.col(conv_col)
    empty = lambda side: F.size(  # noqa: E731
        F.filter(conv, lambda t: t[side].isNull() | (F.trim(t[side]) == ""))
    )
    n_turns = F.size(conv)
    return df.select(
        F.col(id_col),
        n_turns.cast("long").alias("n_turns"),
        empty("human").cast("long").alias("n_empty_human"),
        empty("assistant").cast("long").alias("n_empty_assistant"),
        (
            (n_turns > 0)
            & (empty("human") == 0)
            & (empty("assistant") == 0)
        )
        .cast("int")
        .alias("format_ok"),
    )


def chat_training_pairs(
    df: DataFrame,
    conv_col: str = "conversation",
    id_cols: list[str] | None = None,
    human_prefix: str = "Human: ",
    assistant_prefix: str = "Assistant: ",
) -> DataFrame:
    """Multi-turn SFT example construction: one training pair per
    assistant turn, whose ``context`` is every PRIOR turn rendered in
    order plus the current human message, and whose ``target`` is the
    current assistant reply — the standard chat-to-SFT flattening
    (each turn supervised with full dialog history).

    One per-conversation window (row-bounded by dialog length); the
    context renders via an ordered fold over the collected prior-turn
    array, so the string assembly is deterministic. Turns then flow
    through every §2.2 scorer via the (instruction, output) = (context,
    target) projection.
    """
    id_cols = id_cols or ["conversation_id"]
    turns = flatten_conversations(df, conv_col, id_cols)
    w = (
        Window.partitionBy(*id_cols)
        .orderBy("turn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.collect_list(F.struct("turn", "human", "assistant")).over(w)
    rendered_prior = F.aggregate(
        F.sort_array(prior),
        F.lit(""),
        lambda acc, t: F.concat(
            acc,
            F.lit(human_prefix),
            t["human"],
            F.lit("\n"),
            F.lit(assistant_prefix),
            t["assistant"],
            F.lit("\n"),
        ),
    )
    return turns.withColumn(
        "context",
        F.concat(rendered_prior, F.lit(human_prefix), F.col("human")),
    ).select(*id_cols, "turn", "context", F.col("assistant").alias("target"))
