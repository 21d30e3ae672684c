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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["flatten_conversations", "turns_to_alpaca", "regroup_turns"]


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
