"""Registry batch 34 — pipeline observability + the JL scale path:
random-projection dimensionality reduction (PCA's fit-free twin),
per-source dedup-rate reporting, and the declared-vs-detected language
confusion matrix (label-quality audit for the `lang` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators.clustering import random_projection
from datas_spark.operators.similarity import random_hyperplanes
from datas_spark.registry import _LANG_ORACLE, register

_RP_K = 8
_RP_SEED = 42


def _rp_oracle() -> str:
    planes = random_hyperplanes(64, _RP_K, _RP_SEED)
    comps = ",\n        ".join(
        "round(list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * "
        f"([{', '.join(repr(x) for x in plane)}])[i])), 6)"
        for plane in planes
    )
    return f"""
    SELECT vec_id, [{comps}] AS z
    FROM embeddings
    """


@register("random_projection_embed", oracle=_rp_oracle())
def q_random_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss projection of the 64-dim embeddings onto 8
    seeded pseudo-gaussian planes — `pca_embeddings`' scale twin: no
    fit step, no driver matrix, map-only (each component is one in-row
    dot against literal planes), so it runs unchanged at any corpus
    size. The oracle replays the SAME plane literals, making the
    reduction hash-checkable — the property PCA (eigendecomposition)
    can never give."""
    emb = read_table(spark, sf_dir, "embeddings")
    return random_projection(emb, "embedding", k=_RP_K, seed=_RP_SEED).select(
        "vec_id", "z"
    )


@register(
    "dedup_rate_by_source",
    oracle=r"""
    SELECT source, count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^\w\s]', '', 'g'),
             '\s+', ' ', 'g'))))::BIGINT AS n_unique,
           round((count(*) - count(DISTINCT md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^\w\s]', '', 'g'),
             '\s+', ' ', 'g')))))::DOUBLE / count(*) * 100, 6) AS dup_rate_pct
    FROM documents GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: per source, exact-duplicate rate under the
    engine's normalization (lowercase, punctuation stripped, whitespace
    collapsed — the same fingerprint `exact_dedup` elects on). The
    report that tells a curation pipeline WHICH feeds are syndicating
    copies before any dedup pass runs.

    One grouped aggregate; the distinct-count key is the 16-byte md5 of
    normalized text, so the shuffle carries fingerprints, never
    bodies. At 100 TB swap ``approx_count_distinct`` — same plan."""
    docs = read_table(spark, sf_dir, "documents")
    fp = F.md5(T.normalized_text("text"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(fp).cast("long").alias("n_unique"),
        F.round(
            (F.count(F.lit(1)) - F.count_distinct(fp)).cast("double")
            / F.count(F.lit(1)).cast("double")
            * 100,
            6,
        ).alias("dup_rate_pct"),
    )


@register(
    "lang_id_confusion",
    oracle="WITH guesses AS (" + _LANG_ORACLE + """
    )
    SELECT d.lang AS declared, g.lang_guess AS detected,
           count(*)::BIGINT AS n_docs,
           round(count(*)::DOUBLE
                 / sum(count(*)) OVER (PARTITION BY d.lang) * 100, 6)
             AS pct_of_declared
    FROM documents d JOIN guesses g USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit for the corpus's declared ``lang`` column:
    confusion matrix of declared vs n-gram-detected language with
    row-normalized percentages — the screen that catches a feed whose
    language tags are wrong before they poison a per-language pipeline.

    One map-side detection pass (the same stopword-count expression as
    `language_id`), one grouped count; the percentage window partitions
    by declared language over the ≤|langs|² aggregate rows."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.col("lang").alias("declared"),
            T.language_id("text").alias("detected"),
        )
        .groupBy("declared", "detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("declared")
    return cells.select(
        "declared",
        "detected",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w) * 100, 6
        ).alias("pct_of_declared"),
    )
