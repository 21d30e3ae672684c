"""Registry batch 71 — sketch-accuracy audit (MinHash estimate vs
exact Jaccard on the SAME candidate pairs) and exact-integer embedding
pooling per label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import hashed_shingles_of_hashes, word_tokens
from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.registry3 import _lsh_pairs_oracle
from datas_spark.registry_core import register


@register(
    "minhash_accuracy_audit",
    oracle=rf"""
    WITH est AS MATERIALIZED ({_lsh_pairs_oracle().strip()}
    ), sh2 AS MATERIALIZED (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS g
      FROM documents
    )
    SELECT e.id_a, e.id_b,
           round(e.est_jaccard, 6) AS est_jaccard,
           round(len(list_intersect(a.g, b.g))
                 / (len(a.g) + len(b.g)
                    - len(list_intersect(a.g, b.g)))::DOUBLE, 6) AS exact_jaccard,
           round(abs(e.est_jaccard
                 - len(list_intersect(a.g, b.g))
                   / (len(a.g) + len(b.g)
                      - len(list_intersect(a.g, b.g)))::DOUBLE), 6) AS abs_err
    FROM est e
    JOIN sh2 a ON a.doc_id = e.id_a
    JOIN sh2 b ON b.doc_id = e.id_b
    """,
)
def q_minhash_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: every MinHash-LSH candidate pair priced
    against its EXACT shingle Jaccard — the per-pair estimate error of
    the 16-permutation sketch, end-to-end (banding included). Exact
    side re-attaches the two shingle arrays and intersects map-side —
    cost O(candidates), the same verify shape as prefix filtering."""
    docs = read_table(spark, sf_dir, "documents")
    est = D.minhash_lsh_pairs(docs, "doc_id", "text")
    sh = (
        docs.select(F.col("doc_id").alias("__id"), word_tokens("text").alias("__toks"))
        .select("__id", F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th"))
        .select("__id", hashed_shingles_of_hashes(F.col("__th"), 3).alias("__g"))
        .withColumn("__n", F.size("__g"))
    )
    a = sh.select(
        F.col("__id").alias("id_a"), F.col("__g").alias("__ga"), F.col("__n").alias("__na")
    )
    b = sh.select(
        F.col("__id").alias("id_b"), F.col("__g").alias("__gb"), F.col("__n").alias("__nb")
    )
    inter = F.size(F.array_intersect("__ga", "__gb"))
    exact = inter / (F.col("__na") + F.col("__nb") - inter).cast("double")
    return (
        est.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_err"),
        )
    )


@register(
    "label_mean_embedding",
    oracle="""
    WITH dims AS (
      SELECT label, d.i AS dim,
             round(embedding[d.i]::DOUBLE * 1000000)::BIGINT AS v_e6
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d(i)
    ), agg AS (
      SELECT label, dim, sum(v_e6)::BIGINT AS s, count(*)::BIGINT AS n
      FROM dims GROUP BY 1, 2
    )
    SELECT label,
           any_value(n) AS n_vectors,
           array_to_string(list(round(s / n / 1e6, 6)::DECIMAL(14,6)::VARCHAR ORDER BY dim), ',')
             AS mean_vec_csv
    FROM agg GROUP BY label
    """,
)
def q_label_mean_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the pooled class centroid feeding
    nearest-centroid screens and cluster diagnostics): dims explode
    map-side, per-(label, dim) sums reduce as exact e6-scaled BIGINTs
    (float sums are order-dependent; integers are not), one division
    at the end, vector re-assembled in dim order as CSV for the
    driver's scalar canonicalizer."""
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        F.posexplode("embedding").alias("__i", "__v"),
    ).select(
        "label",
        (F.col("__i") + 1).alias("dim"),
        F.round(F.col("__v").cast("double") * 1_000_000).cast("long").alias("v_e6"),
    )
    agg = dims.groupBy("label", "dim").agg(
        F.sum("v_e6").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    per_label = agg.groupBy("label").agg(
        F.any_value("n").alias("n_vectors"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s", "n"))),
                lambda x: F.round(x["s"] / x["n"] / 1e6, 6)
                .cast("decimal(14,6)")
                .cast("string"),
            ),
        ).alias("mean_vec_csv"),
    )
    return per_label
