"""Registry batch 79 — closing analytics: inter-label centroid
distances, near-dup component density (false-merge audit), and the
one-row corpus datacard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import normalized_text
from datas_spark.io.sources import read_table
from datas_spark.registry_core import register


@register(
    "label_centroid_distances",
    oracle="""
    WITH dims AS (
      SELECT label, d.i AS dim,
             round(embedding[d.i]::DOUBLE * 1000000)::BIGINT AS v
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d(i)
    ), cent AS (
      SELECT label, dim, sum(v)::BIGINT AS s, count(*)::BIGINT AS n
      FROM dims GROUP BY 1, 2
    ), pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             sum(a.s * b.s)::HUGEINT AS dot,
             sum(a.s * a.s)::HUGEINT AS na,
             sum(b.s * b.s)::HUGEINT AS nb
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           round(CASE WHEN na > 0 AND nb > 0
                 THEN dot / (sqrt(na::DOUBLE) * sqrt(nb::DOUBLE)) END, 6)
             AS centroid_cos
    FROM pairs
    """,
)
def q_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids (cluster
    separation map — near-parallel centroids flag label pairs worth
    merging or re-labeling). Centroid sums are exact e6 integers; the
    pair fan runs over |labels|·dims aggregate rows, never vectors.
    Note the centroid-SUM cosine equals the centroid-MEAN cosine (the
    1/n factors cancel), so no division precedes the final one."""
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("__i", "__v")
    ).select(
        "label",
        (F.col("__i") + 1).alias("dim"),
        F.round(F.col("__v").cast("double") * 1_000_000).cast("long").alias("v"),
    )
    cent = dims.groupBy("label", "dim").agg(F.sum("v").cast("long").alias("s"))
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("s").alias("__sa")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("s").alias("__sb")
    )
    pairs = (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("__sa").cast("decimal(38,0)") * F.col("__sb")).alias("__dot"),
            F.sum(F.col("__sa").cast("decimal(38,0)") * F.col("__sa")).alias("__na"),
            F.sum(F.col("__sb").cast("decimal(38,0)") * F.col("__sb")).alias("__nb"),
        )
    )
    cos = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        F.col("__dot").cast("double")
        / (F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double"))),
    )
    return pairs.select(
        "label_a", "label_b", F.round(cos, 6).alias("centroid_cos")
    )


@register(
    "component_density",
    oracle=r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM sh
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p
    ), reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), sizes AS (
      SELECT component, count(*)::BIGINT AS n_nodes FROM comp GROUP BY 1
    ), edges_per AS (
      SELECT c.component, count(*)::BIGINT AS n_edges
      FROM p JOIN comp c ON p.id_a = c.node
      GROUP BY 1
    )
    SELECT s.component, s.n_nodes,
           coalesce(ep.n_edges, 0) AS n_edges,
           round(coalesce(ep.n_edges, 0)
                 / (s.n_nodes * (s.n_nodes - 1) / 2.0), 6) AS density
    FROM sizes s LEFT JOIN edges_per ep USING (component)
    WHERE s.n_nodes >= 2
    """,
)
def q_component_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-merge audit for near-dup components: edge density per
    component (edges / C(n,2)). A clique (density 1) is a genuine
    duplicate cluster; a long low-density chain is transitive
    over-merging — exactly what `near_dedup_keep_first` would
    wrongly collapse. Pairs + CC read the materialize-once artifacts
    (full-recompute oracle keeps the hash-proof) + two combinable
    counts."""
    from datas_spark.operators import artifacts as ART

    pairs = ART.pairs_artifact(spark, sf_dir, "jaccard")
    comp = ART.components_artifact(spark, sf_dir, "jaccard")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    edges_per = (
        pairs.join(
            comp.withColumnRenamed("node", "id_a"), "id_a"
        )
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    return (
        sizes.join(edges_per, "component", "left")
        .where(F.col("n_nodes") >= 2)
        .select(
            "component",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2.0),
                6,
            ).alias("density"),
        )
    )


@register(
    "corpus_datacard",
    oracle=r"""
    WITH base AS (
      SELECT count(*)::BIGINT AS n_docs,
             count(DISTINCT source)::BIGINT AS n_sources,
             count(DISTINCT lang)::BIGINT AS n_langs,
             sum(n_chars)::BIGINT AS total_chars,
             min(n_chars)::BIGINT AS min_chars,
             max(n_chars)::BIGINT AS max_chars
      FROM documents
    ), toks AS (
      SELECT sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x != '')))::BIGINT AS total_words
      FROM documents
    ), dups AS (
      SELECT (count(*) - count(DISTINCT md5(
        trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                            '\s+', ' ', 'g')))))::BIGINT AS n_exact_dups
      FROM documents
    )
    SELECT n_docs, n_sources, n_langs, total_chars, min_chars, max_chars,
           total_words, n_exact_dups,
           round(total_chars / n_docs::DOUBLE, 2) AS mean_chars,
           round(n_exact_dups / n_docs::DOUBLE * 100, 4) AS dup_pct
    FROM base CROSS JOIN toks CROSS JOIN dups
    """,
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row release datacard: corpus size, source/language
    spread, token mass, normalized exact-dup rate — the summary block
    every public dataset card leads with, from two combinable scans."""
    docs = read_table(spark, sf_dir, "documents")
    fp = F.md5(normalized_text("text"))
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum(
            F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != ""))
        )
        .cast("long")
        .alias("total_words"),
        (F.count(F.lit(1)) - F.count_distinct(fp)).cast("long").alias("n_exact_dups"),
    )
    return base.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "min_chars",
        "max_chars",
        "total_words",
        "n_exact_dups",
        F.round(F.col("total_chars") / F.col("n_docs").cast("double"), 2).alias(
            "mean_chars"
        ),
        F.round(
            F.col("n_exact_dups") / F.col("n_docs").cast("double") * 100, 4
        ).alias("dup_pct"),
    )
