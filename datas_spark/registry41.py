"""Registry batch 41 — boilerplate template mining: the most frequent
document PREFIXES (first k tokens). Templated feeds ("Sign up for our
newsletter …", scraped navigation chrome) surface here before any
pairwise dedup runs; the top templates become strip rules upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens
from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_PFX_K = 6
_PFX_MIN = 3


@register(
    "common_prefix_templates",
    oracle=rf"""
    WITH p AS (
      SELECT array_to_string(
               (string_split_regex(trim(lower(text)), '\s+'))[1:{_PFX_K}], ' ')
               AS prefix,
             len(string_split_regex(trim(lower(text)), '\s+')) AS ntok
      FROM documents
    )
    SELECT prefix, count(*)::BIGINT AS n_docs
    FROM p WHERE ntok >= {_PFX_K}
    GROUP BY prefix HAVING count(*) >= {_PFX_MIN}
    ORDER BY n_docs DESC, prefix ASC
    LIMIT 20
    """,
)
def q_common_prefix_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most repeated {_PFX_K}-token document prefixes (appearing
    in >= {_PFX_MIN} docs) — the boilerplate/template screen. One
    map-side prefix projection (docs shorter than the prefix are
    excluded, not padded), a combinable grouped count, and a
    TakeOrderedAndProject top-20 under the (count desc, prefix asc)
    total order."""
    docs = read_table(spark, sf_dir, "documents")
    toks = word_tokens(F.lower("text"))
    p = docs.select(
        F.array_join(F.slice(toks, 1, _PFX_K), " ").alias("prefix"),
        F.size(toks).alias("__n"),
    ).where(F.col("__n") >= _PFX_K)
    return (
        p.groupBy("prefix")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= _PFX_MIN)
        .orderBy(F.col("n_docs").desc(), F.col("prefix").asc())
        .limit(20)
    )
