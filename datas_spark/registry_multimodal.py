"""Multimodal (binary media) fleet queries.

Consolidated from the former numeric registry batches 43 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry43.py
# ==================================================================

"""Registry batch 43 — multimodal fleet summary: per-mime inventory of
a media column (count, byte totals, size spread) from the magic-byte
sniff alone — the storage-planning view of a mixed media corpus,
computed without ever decoding or shuffling a blob.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.operators import multimodal as MM
from datas_spark.registry_core import register


@register(
    "media_type_summary",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
        unhex(CASE WHEN doc_id % 3 = 0 THEN '89504E47'
                   WHEN doc_id % 3 = 1 THEN 'FFD8' ELSE '' END
              || hex(encode(text))) AS content
      FROM documents
    ), typed AS (
      SELECT CASE WHEN substr(hex(content), 1, 8) = '89504E47'
                  THEN 'image/png'
                  WHEN substr(hex(content), 1, 4) = 'FFD8'
                  THEN 'image/jpeg'
                  ELSE 'application/octet-stream' END AS mime,
             octet_length(content)::BIGINT AS n_bytes
      FROM m
    )
    SELECT mime, count(*)::BIGINT AS n_files,
           sum(n_bytes)::BIGINT AS total_bytes,
           min(n_bytes)::BIGINT AS min_bytes,
           max(n_bytes)::BIGINT AS max_bytes
    FROM typed GROUP BY mime
    """,
)
def q_media_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mime media inventory: file count and byte totals/extremes
    per sniffed type. The aggregate consumes only the metadata columns
    (`attach_media_metadata`'s JVM-side magic-byte sniff + length) —
    the blob column prunes out of the plan entirely, so at 100 TB this
    is a scan of two narrow columns, not a shuffle of payloads."""
    from datas_spark.registry_taskvector import _synth_media  # lazy: avoid circular import

    media = _synth_media(spark, sf_dir)
    typed = MM.attach_media_metadata(media).select("mime", "n_bytes")
    return typed.groupBy("mime").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min("n_bytes").cast("long").alias("min_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
    )
