"""Registry batch 73 — dedup-method agreement audit: the Venn counts
of the three near-dup pair families (exact n-gram Jaccard, banded
SimHash, MinHash-LSH estimate) over the same corpus — the measurement
that tells a curation pipeline what each cheaper tier actually trades
away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.operators import artifacts as ART
from datas_spark.registry3 import _lsh_pairs_oracle
from datas_spark.registry10 import _simhash_near_dup_oracle
from datas_spark.registry_core import register

_AGREE_JAC_T = 0.2
_AGREE_MH_T = 0.2

_JAC_PAIRS_SQL = rf"""
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
               count(*) AS shared
        FROM (
          SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM (
            SELECT doc_id,
              list_distinct(list_transform(
                range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
                i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
                AS grams
            FROM documents
          )
        ) a JOIN (
          SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM (
            SELECT doc_id,
              list_distinct(list_transform(
                range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
                i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
                AS grams
            FROM documents
          )
        ) b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
      ) WHERE shared / (na + nb - shared) >= {_AGREE_JAC_T}
"""


@register(
    "dedup_method_agreement",
    oracle=f"""
    WITH jac AS MATERIALIZED ({_JAC_PAIRS_SQL}
    ), sim AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_simhash_near_dup_oracle(60).strip()})
    ), mh AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_lsh_pairs_oracle().strip()})
      WHERE est_jaccard >= {_AGREE_MH_T}
    ), tagged AS (
      SELECT id_a, id_b, 1 AS j, 0 AS s, 0 AS m FROM jac
      UNION ALL SELECT id_a, id_b, 0, 1, 0 FROM sim
      UNION ALL SELECT id_a, id_b, 0, 0, 1 FROM mh
    ), pairs AS (
      SELECT id_a, id_b, max(j) AS j, max(s) AS s, max(m) AS m
      FROM tagged GROUP BY 1, 2
    )
    SELECT count(*) FILTER (j = 1)::BIGINT AS n_jaccard,
           count(*) FILTER (s = 1)::BIGINT AS n_simhash,
           count(*) FILTER (m = 1)::BIGINT AS n_minhash,
           count(*) FILTER (j = 1 AND s = 1)::BIGINT AS n_jac_sim,
           count(*) FILTER (j = 1 AND m = 1)::BIGINT AS n_jac_mh,
           count(*) FILTER (s = 1 AND m = 1)::BIGINT AS n_sim_mh,
           count(*) FILTER (j = 1 AND s = 1 AND m = 1)::BIGINT AS n_all,
           count(*)::BIGINT AS n_union
    FROM pairs
    """,
)
def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of Venn counts over the three near-dup pair families on
    the same corpus: exact n-gram Jaccard (t={_AGREE_JAC_T}), banded
    60-bit SimHash (hamming<=3), MinHash-LSH (est>={_AGREE_MH_T}) —
    'measure, don't guess' applied to the dedup-tier choice itself.
    All three pair families read the materialize-once artifact store
    (each derived once per corpus fingerprint on their own proven
    path); the audit adds one union + one grouped-flags aggregate over
    three parquet reads."""
    jac = ART.pairs_artifact(spark, sf_dir, "jaccard").select("id_a", "id_b")
    sim = ART.pairs_artifact(spark, sf_dir, "simhash").select("id_a", "id_b")
    mh = (
        ART.pairs_artifact(spark, sf_dir, "minhash")
        .where(F.col("est_jaccard") >= _AGREE_MH_T)
        .select("id_a", "id_b")
    )
    tagged = (
        jac.select("id_a", "id_b", F.lit(1).alias("j"), F.lit(0).alias("s"), F.lit(0).alias("m"))
        .unionByName(
            sim.select("id_a", "id_b", F.lit(0).alias("j"), F.lit(1).alias("s"), F.lit(0).alias("m"))
        )
        .unionByName(
            mh.select("id_a", "id_b", F.lit(0).alias("j"), F.lit(0).alias("s"), F.lit(1).alias("m"))
        )
    )
    pairs = tagged.groupBy("id_a", "id_b").agg(
        F.max("j").alias("j"), F.max("s").alias("s"), F.max("m").alias("m")
    )
    return pairs.agg(
        F.count_if(F.col("j") == 1).cast("long").alias("n_jaccard"),
        F.count_if(F.col("s") == 1).cast("long").alias("n_simhash"),
        F.count_if(F.col("m") == 1).cast("long").alias("n_minhash"),
        F.count_if((F.col("j") == 1) & (F.col("s") == 1)).cast("long").alias("n_jac_sim"),
        F.count_if((F.col("j") == 1) & (F.col("m") == 1)).cast("long").alias("n_jac_mh"),
        F.count_if((F.col("s") == 1) & (F.col("m") == 1)).cast("long").alias("n_sim_mh"),
        F.count_if(
            (F.col("j") == 1) & (F.col("s") == 1) & (F.col("m") == 1)
        ).cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
