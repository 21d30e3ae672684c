"""Registry batch 42 — conversation-level format gating: the
structural check every dialog corpus runs before turn-level scoring
(reference `src/pipeline/base.py:28` generalized to multi-turn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datas_spark.operators import conversations as CV
from datas_spark.registry_core import register


@register(
    "conversation_format_audit",
    oracle="""
    SELECT doc_id AS conversation_id,
           2::BIGINT AS n_turns,
           (CASE WHEN trim(substr(text, 1, 40)) = '' THEN 1 ELSE 0 END
            + CASE WHEN trim(substr(text, 41, 40)) = '' THEN 1 ELSE 0 END)
             ::BIGINT AS n_empty_human,
           (CASE WHEN trim(lang) = '' THEN 1 ELSE 0 END
            + CASE WHEN trim(source) = '' THEN 1 ELSE 0 END)
             ::BIGINT AS n_empty_assistant,
           CASE WHEN trim(substr(text, 1, 40)) != ''
                 AND trim(substr(text, 41, 40)) != ''
                 AND trim(lang) != '' AND trim(source) != ''
                THEN 1 ELSE 0 END AS format_ok
    FROM documents
    """,
)
def q_conversation_format_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format gate over the synthetic ShareGPT rows: per conversation,
    turn count and empty-side counts with a pass/fail verdict — docs
    shorter than 40 chars yield an empty second-turn human side and
    fail, exactly the planted defect class. Map-side array traversals,
    zero shuffles."""
    # lazy: registry3 itself imports the registry package — a module-
    # level import here would be circular when registry3 loads first
    from datas_spark.registry3 import _synth_conversations

    conv = _synth_conversations(spark, sf_dir)
    return CV.conversation_format_check(conv)
