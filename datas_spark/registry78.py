"""Registry batch 78 — multi-turn chat → SFT training pairs
(`conversations.chat_training_pairs`): every assistant turn becomes a
(full-history context, reply) example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.operators import conversations as CV
from datas_spark.registry3 import _synth_conversations
from datas_spark.registry_core import register


@register(
    "chat_training_pairs",
    oracle="""
    SELECT doc_id AS conversation_id, 0 AS turn,
           'Human: ' || substr(text, 1, 40) AS context,
           lang AS target
    FROM documents
    UNION ALL
    SELECT doc_id, 1,
           'Human: ' || substr(text, 1, 40) || chr(10)
             || 'Assistant: ' || lang || chr(10)
             || 'Human: ' || substr(text, 41, 40),
           source
    FROM documents
    """,
)
def q_chat_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-to-SFT flattening on the synthetic ShareGPT frame: turn t's
    context renders every prior (human, assistant) exchange in order
    plus the current human message; the target is the reply. One
    per-conversation row-bounded window + an ordered fold — each turn
    trains with full history, the standard multi-turn supervision."""
    conv = _synth_conversations(spark, sf_dir)
    out = CV.chat_training_pairs(conv)
    return out.select(
        "conversation_id", F.col("turn").cast("int").alias("turn"), "context", "target"
    )
