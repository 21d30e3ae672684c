"""Registry batch 56 — corpus text-normalization pass and deterministic
k-fold assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.operators import splits as SP
from datas_spark.registry_core import register


@register(
    "clean_text_docs",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, 'https?://[^\s]+', ' ', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
               '[\x00-\x08\x0B\x0C\x0E-\x1F]', ' ', 'g'),
             '\s+', ' ', 'g')) AS text_clean,
           length(text)::BIGINT AS n_before
    FROM documents
    """,
)
def q_clean_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization cleanup (URLs/emails → space, C0 controls
    dropped, whitespace collapsed, trimmed) — map-only chained
    regexp_replace, the same RE2-safe literals in both engines."""
    docs = read_table(spark, sf_dir, "documents")
    out = C.clean_text(docs, "text")
    return out.select(
        "doc_id", "text_clean", F.length("text").cast("long").alias("n_before")
    )


@register(
    "doc_kfold_assign",
    oracle="""
    SELECT doc_id,
           (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 5)::INT
             AS fold,
           (('0x' || substr(md5(coalesce(source::VARCHAR, doc_id::VARCHAR)),
                            1, 15))::BIGINT % 5)::INT
             AS source_fold
    FROM documents
    """,
)
def q_doc_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold CV assignment, per row AND per group
    (grouped on source: every doc of a source shares a fold — the
    grouped-CV leakage rule). Pure map-side md5 expressions. The
    oracle mirrors kfold_assign's NULL-group fallback to the row id,
    so it encodes the operator's full contract, not the data shape."""
    docs = read_table(spark, sf_dir, "documents")
    out = SP.kfold_assign(docs, "doc_id", k=5)
    out = SP.kfold_assign(out, "doc_id", k=5, group_col="source", out_col="source_fold")
    return out.select("doc_id", "fold", "source_fold")
