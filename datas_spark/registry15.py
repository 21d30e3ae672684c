"""Registry batch 15 — graph triangle enumeration over the near-dup
graph, corpus snapshot diffing, and referential-integrity validation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.operators.diff import snapshot_diff
from datas_spark.registry_core import register
from datas_spark.registry2 import _lsh_blocked_oracle
from datas_spark.registry6 import _AUG_SQL, _EMAIL, _IP, _PHONE, _augment_pii

# ---------------------------------------------------------------------------
# triangles in the near-dup graph (cluster-quality signal)
# ---------------------------------------------------------------------------

@register(
    "near_dup_triangles",
    oracle=f"""
    WITH e AS ({_lsh_blocked_oracle(4)})
    SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
    FROM e e1
    JOIN e e2 ON e2.id_a = e1.id_b
    JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    """,
)
def q_near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the LSH-blocked embedding near-dup
    graph — the cluster-quality signal that separates genuine duplicate
    cliques from chain-shaped LSH noise. Two edge joins, no cross
    join (see `dedup.triangle_list`)."""
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = D.lsh_blocked_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, n_planes=4
    )
    return D.triangle_list(pairs)


# ---------------------------------------------------------------------------
# corpus snapshot diff (pipeline regression audit)
# ---------------------------------------------------------------------------

_DEDUP_NORM_SQL = (
    r"md5(trim(regexp_replace("
    r"regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+', ' ', 'g')))"
)


@register(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH aug AS ({_AUG_SQL}),
    ded AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, row_number() OVER (
          PARTITION BY {_DEDUP_NORM_SQL} ORDER BY doc_id) AS rn
        FROM aug
      ) WHERE rn = 1
    ), red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                 '{_PHONE}', '<PHONE>', 'g'),
               '{_IP}', '<IP>', 'g') AS text
      FROM ded
    )
    SELECT o.doc_id,
      CASE WHEN n.doc_id IS NULL THEN 'removed'
           WHEN o.text != n.text THEN 'changed'
           ELSE 'unchanged' END AS change
    FROM aug o LEFT JOIN red n USING (doc_id)
    """,
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What did the pipeline change: diff the (PII-augmented) corpus
    against its dedup+redact output per doc_id — 'removed' = dropped
    as an exact duplicate, 'changed' = redaction rewrote the text,
    'unchanged' otherwise. One full-outer join on the id with md5
    payload digests (`operators.diff.snapshot_diff`)."""
    from datas_spark.operators.corpus import pii_redact

    docs = _augment_pii(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    new = pii_redact(D.exact_dedup(docs, "text", "doc_id"), "text").select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    return snapshot_diff(docs, new, ["doc_id"], ["text"])


# ---------------------------------------------------------------------------
# referential-integrity validation
# ---------------------------------------------------------------------------

@register(
    "fk_violations",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))::BIGINT
             AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))::BIGINT
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))::BIGINT
    """,
)
def q_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan-row
    counts per FK relationship via LEFT ANTI joins (each a broadcast
    join when the parent side is small — nation/customer — and a
    shuffled semi-join otherwise). The data-quality gate you run
    before trusting any join-based metric downstream."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    supp = read_table(spark, sf_dir, "supplier")

    def orphans(child, parent, ck, pk, name):
        n = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
        return n.select(F.lit(name).alias("relationship"), "n_orphans")

    return (
        orphans(li, orders, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(orphans(orders, cust, "o_custkey", "c_custkey", "orders->customer"))
        .unionByName(orphans(cust, nation, "c_nationkey", "n_nationkey", "customer->nation"))
        .unionByName(orphans(supp, nation, "s_nationkey", "n_nationkey", "supplier->nation"))
    )
