"""Embedding similarity/ANN queries: LSH/IVF/SQ8, cluster analytics, plagiarism matrix, JL projection.

Consolidated from the former numeric registry batches 8, 31, 33, 34, 44 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry8.py
# ==================================================================

r"""Query registry, batch 8 (round 3): per-key weighted sampling,
z-score outlier gating, histogram-based decile assignment, and
per-dimension embedding standardization.

Imported by datas_spark.registry for its side effects (registrations).
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register
from datas_spark.registry_curation import _MD5_UNIT_SQL


@register(
    "weighted_sample_per_key",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY pow({_MD5_UNIT_SQL.format(key="doc_id::VARCHAR")},
                            1.0 / n_chars) DESC, doc_id ASC) AS rk
      FROM documents WHERE n_chars > 0
    ) WHERE rk <= 10
    """,
)
def q_weighted_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain Efraimidis-Spirakis quota draw: 10 docs per language,
    probability proportional to length, deterministic md5 uniform —
    the mixture-construction sampler (per-key twin of
    weighted_sample's global top-k)."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return C.weighted_sample_per_key(docs, "lang", "doc_id", "n_chars", k=10)


@register(
    "length_outliers",
    oracle="""
    WITH s AS (
      SELECT lang, avg(n_chars::DOUBLE) AS mu, stddev_samp(n_chars::DOUBLE) AS sd
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           CASE WHEN s.sd > 0
                THEN round((d.n_chars::DOUBLE - s.mu) / s.sd, 4) + 0.0
           END AS zscore,
           coalesce((abs(round((d.n_chars::DOUBLE - s.mu) / s.sd, 4) + 0.0)
                     > 2.0)::INT, 0) AS is_outlier
    FROM documents d JOIN s USING (lang)
    """,
)
def q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score outlier gate over document lengths (|z| >
    2): one algebraic aggregate per group, broadcast back, map-only
    flagging — the anomaly pre-filter before any corpus statistic is
    trusted."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return C.zscore_outliers(docs, "lang", "n_chars", k=2.0)


@register(
    "length_deciles",
    oracle="""
    WITH h AS (
      SELECT n_chars AS v, count(*) AS c FROM documents
      WHERE n_chars IS NOT NULL GROUP BY n_chars
    ), cuts AS (
      SELECT v,
             ceil(10.0 * sum(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  / sum(c) OVER ())::INT AS bucket
      FROM h
    )
    SELECT d.doc_id, d.n_chars, cuts.bucket
    FROM documents d LEFT JOIN cuts ON d.n_chars = cuts.v
    """,
)
def q_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment over document length WITHOUT a global sort:
    per-distinct-value histogram (bounded for integer metrics),
    cumulative count over that tiny frame, broadcast value→bucket map.
    ntile() would be one single-reducer sort at 100 TB; the only
    ordered structure here is |distinct lengths| rows."""
    from datas_spark.operators import corpus as C

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return C.value_deciles(docs, "n_chars", buckets=10)


@register(
    "standardize_embeddings",
    oracle="""
    WITH e AS (
      SELECT unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS d
      FROM embeddings
    ), s AS (
      SELECT d, avg(v) AS mu, stddev_samp(v) AS sd FROM e GROUP BY d
    ), packed AS (
      SELECT list(mu ORDER BY d) AS mus, list(sd ORDER BY d) AS sds FROM s
    )
    SELECT vec_id,
           list_transform(range(1, len(embedding) + 1),
             i -> CASE WHEN packed.sds[i] > 0
                       THEN round((embedding[i]::DOUBLE - packed.mus[i])
                                  / packed.sds[i], 6) + 0.0
                  END) AS z
    FROM embeddings, packed
    """,
)
def q_standardize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding standardization (z = (v - mean_d) /
    std_d): one |dim|-group aggregate collapsed to a broadcast stats
    array, then a map-only zip_with — the normalization pass distance-
    based downstream steps (KMeans, k-center, cosine buckets) assume."""
    from datas_spark.operators.clustering import standardize_embeddings

    emb = read_table(spark, sf_dir, "embeddings")
    return standardize_embeddings(emb, "vec_id", "embedding").select("vec_id", "z")


_IVF_COS_SQL = """
        round(
          list_sum(list_transform(range(1, len({a}.embedding) + 1),
                   i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len({a}.embedding) + 1),
                   i -> {a}.embedding[i]::DOUBLE * {a}.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len({b}.embedding) + 1),
                   i -> {b}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE)))), 6)
          + 0.0
"""


@register(
    "ivf_topk",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < 8
    ), ac AS (
      SELECT e.vec_id AS did, c.cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='e', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings e CROSS JOIN cells c
    ), assign AS (
      SELECT did, cell FROM ac WHERE rn = 1
    ), qp AS (
      SELECT q.vec_id AS qid, c.cell,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='q', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings q CROSS JOIN cells c
      WHERE q.vec_id < 3
    ), probes AS (
      SELECT qid, cell FROM qp WHERE rn <= 3
    ), scored AS (
      SELECT p.qid AS q_vec_id, a.did AS d_vec_id,
             {_IVF_COS_SQL.format(a='d', b='q')} AS cos
      FROM probes p
      JOIN assign a USING (cell)
      JOIN embeddings d ON d.vec_id = a.did
      JOIN embeddings q ON q.vec_id = p.qid
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a fixed sample quantizer (cells = embeddings of
    vec_id < 8): assignment by map-side min_by (no window over the
    data), 3-cell probes, exact cosine inside — and because the
    quantizer is deterministic data, the WHOLE approximate query
    hash-checks. This carries the driver-visible ``ivf_topk`` name so
    the driver's 50-row table verifies it by hash; the MLlib-KMeans
    learned-quantizer twin is ``ivf_topk_learned`` (registry_scoring,
    rows-only by design)."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    cells = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    return SIM.ivf_topk_fixed(
        emb, emb.where("vec_id < 3"), cells,
        "vec_id", "vec_id", "cell", "embedding", k=10, n_probe=3,
    )


# `user_cohort_retention` moved to registry_events (VERDICT r7 #5):
# it is the (cohort, offset, actives) projection of
# events.retention_cohort_matrix and never belonged in this registry.


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    head = r"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    ), e AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), deg AS (
      SELECT s, count(*) AS dg FROM e GROUP BY s
    ), nn AS (
      SELECT count(*) AS n FROM deg
    ), pr0 AS (
      SELECT s AS node, round(1.0 / (SELECT n FROM nn), 9) AS pr FROM deg
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f"""
    , pr{i} AS (
      SELECT node,
             round((1 - {damping}) / (SELECT n FROM nn) + {damping} * mass, 9)
               AS pr
      FROM (
        SELECT e.d AS node, sum(p.pr / deg.dg) AS mass
        FROM e JOIN pr{i - 1} p ON e.s = p.node JOIN deg ON e.s = deg.s
        GROUP BY e.d
      )
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, round(pr, 6) AS pagerank FROM pr{iterations}
    """
    )


@register("near_dup_pagerank", oracle=_pagerank_oracle())
def q_near_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over the 3-gram-Jaccard
    near-dup graph: centrality flags the canonical/boilerplate hubs
    many near-copies orbit — a survivor-election signal beyond
    length/score, and the fixed-iteration iterative-algorithm template
    (per-step rounding pins cross-engine float agreement; the oracle is
    the same iterations unrolled as chained CTEs)."""
    from datas_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    return D.pagerank(pairs, iterations=3, damping=0.85)

# ==================================================================
# former registry31.py
# ==================================================================

"""Registry batch 31 — compressed-domain ANN, customer RFM
segmentation, percent-of-parent OLAP rollup, and the timed funnel.

`sq8_topk` is the similarity family's storage-scale path: int8 scalar
quantization cuts first-pass scan bandwidth 4×, candidate ranking runs
on EXACT INTEGER dot products (deterministic at any cutoff), and only
k·oversample survivors per query are re-scored in float.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import similarity as SIM
from datas_spark.registry_core import register

_SQ8_ORACLE = """
    WITH amax AS (
      SELECT max(list_max(list_transform(embedding, x -> abs(x::DOUBLE)))) AS a
      FROM embeddings
    ), dq AS (
      SELECT e.vec_id, e.embedding,
             list_transform(e.embedding,
                            x -> round(x::DOUBLE * 127 / am.a)::BIGINT) AS q8
      FROM embeddings e CROSS JOIN amax am
    ), qq AS (
      SELECT vec_id AS qid, embedding AS qv, q8 AS qq8 FROM dq WHERE vec_id < 3
    ), scored AS (
      SELECT q.qid, d.vec_id AS did,
             list_sum(list_transform(range(1, len(d.q8) + 1),
                      i -> d.q8[i] * q.qq8[i]))::BIGINT AS s
      FROM dq d CROSS JOIN qq q
    ), kept AS (
      SELECT qid, did FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, did ASC) AS ar
        FROM scored
      ) WHERE ar <= 40
    ), rer AS (
      SELECT k.qid AS q_vec_id, k.did AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS cos
      FROM kept k JOIN dq d ON k.did = d.vec_id JOIN qq q ON k.qid = q.qid
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM rer
    ) WHERE rank <= 10
    """


@register("sq8_topk", oracle=_SQ8_ORACLE)
def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized ANN: integer-dot candidate pass (4× less scan
    bandwidth than float, deterministic ranking) + exact cosine rerank
    of 4k survivors per query. Same output contract as `cosine_topk`;
    the DuckDB twin replays quantization, integer ranking, and rerank
    bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.sq8_topk(
        emb, emb.where("vec_id < 3"), "vec_id", "vec_id", "embedding",
        k=10, oversample=4,
    )


_RFM_REF = "2001-09-01"  # 'now' anchor for recency (data ends 2001-08)


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), TIMESTAMP '{_RFM_REF}')::BIGINT
               AS recency_days,
             count(*)::BIGINT AS frequency,
             sum(o_totalprice::DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY 1
    ), thr AS (
      SELECT round(quantile_cont(recency_days::DOUBLE, 0.25), 6) AS r1,
             round(quantile_cont(recency_days::DOUBLE, 0.50), 6) AS r2,
             round(quantile_cont(recency_days::DOUBLE, 0.75), 6) AS r3,
             round(quantile_cont(frequency::DOUBLE, 0.25), 6) AS f1,
             round(quantile_cont(frequency::DOUBLE, 0.50), 6) AS f2,
             round(quantile_cont(frequency::DOUBLE, 0.75), 6) AS f3,
             round(quantile_cont(monetary::DOUBLE, 0.25), 6) AS m1,
             round(quantile_cont(monetary::DOUBLE, 0.50), 6) AS m2,
             round(quantile_cont(monetary::DOUBLE, 0.75), 6) AS m3
      FROM base
    )
    SELECT b.o_custkey AS custkey, b.recency_days, b.frequency,
           round(b.monetary::DOUBLE, 2) AS monetary,
           (5 - (CASE WHEN b.recency_days::DOUBLE <= t.r1 THEN 1
                      WHEN b.recency_days::DOUBLE <= t.r2 THEN 2
                      WHEN b.recency_days::DOUBLE <= t.r3 THEN 3
                      ELSE 4 END))::BIGINT AS r_score,
           (CASE WHEN b.frequency::DOUBLE <= t.f1 THEN 1
                 WHEN b.frequency::DOUBLE <= t.f2 THEN 2
                 WHEN b.frequency::DOUBLE <= t.f3 THEN 3
                 ELSE 4 END)::BIGINT AS f_score,
           (CASE WHEN b.monetary::DOUBLE <= t.m1 THEN 1
                 WHEN b.monetary::DOUBLE <= t.m2 THEN 2
                 WHEN b.monetary::DOUBLE <= t.m3 THEN 3
                 ELSE 4 END)::BIGINT AS m_score
    FROM base b CROSS JOIN thr t
    """,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs a
    fixed anchor), frequency (order count), monetary (DECIMAL revenue)
    per customer, each scored 1–4 by quartile — the classic
    rank-free segmentation.

    Scale shape: ONE per-customer aggregate pass; the nine quartile
    thresholds come from a single combinable percentile buffer
    (1-row frame, broadcast), and scoring is a map-side CASE — no
    global rank/ntile window over customers (the usual RFM
    implementation's single-reducer sort). Thresholds are rounded to
    6 dp before comparison so quartile membership is identical on
    both engines; recency inverts (recent = high score)."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_REF).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        )
        .cast("long")
        .alias("recency_days"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__mon"),
    )
    thr = base.agg(
        *[
            F.round(F.percentile(F.col(c).cast("double"), F.lit(p)), 6).alias(
                f"{pre}{i}"
            )
            for c, pre in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("__mon", "m"),
            )
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def bucket(col: str, pre: str) -> F.Column:
        v = F.col(col).cast("double")
        return (
            F.when(v <= F.col(f"{pre}1"), 1)
            .when(v <= F.col(f"{pre}2"), 2)
            .when(v <= F.col(f"{pre}3"), 3)
            .otherwise(4)
        )

    return base.crossJoin(F.broadcast(thr)).select(
        "custkey",
        "recency_days",
        "frequency",
        F.round(F.col("__mon").cast("double"), 2).alias("monetary"),
        (F.lit(5) - bucket("recency_days", "r")).cast("long").alias("r_score"),
        bucket("frequency", "f").cast("long").alias("f_score"),
        bucket("__mon", "m").cast("long").alias("m_score"),
    )


@register(
    "region_share_rollup",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice::DECIMAL(18,2)) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), reg AS (
      SELECT region, sum(rev) AS region_rev FROM nat GROUP BY 1
    ), tot AS (
      SELECT sum(rev) AS global_rev FROM nat
    )
    SELECT n.region, n.nation, round(n.rev::DOUBLE, 2) AS revenue,
           round(n.rev::DOUBLE / r.region_rev::DOUBLE * 100, 6)
             AS pct_of_region,
           round(r.region_rev::DOUBLE / t.global_rev::DOUBLE * 100, 6)
             AS region_pct_of_global
    FROM nat n JOIN reg r USING (region) CROSS JOIN tot t
    """,
)
def q_region_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchy rollup (nation→region→global): each
    nation's revenue share of its region and each region's share of
    the world — the drill-down table every OLAP UI renders.

    One fact aggregate at the finest grain; the coarser levels are
    re-aggregations of that ≤|nations|-row frame (never a second fact
    scan), joined back broadcast. Revenue sums stay DECIMAL; shares
    divide once, as doubles, rounded 6 dp."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    dim = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
    )
    nat = (
        orders.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("region", "nation")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    reg = nat.groupBy("region").agg(F.sum("rev").alias("region_rev"))
    tot = nat.agg(F.sum("rev").alias("global_rev"))
    return (
        nat.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("region_rev").cast("double") * 100,
                6,
            ).alias("pct_of_region"),
            F.round(
                F.col("region_rev").cast("double")
                / F.col("global_rev").cast("double")
                * 100,
                6,
            ).alias("region_pct_of_global"),
        )
    )


# `events_timed_funnel` moved to registry_events (round 8 homing sweep —
# the same drift class as VERDICT r7 #5's user_cohort_retention).


# ==================================================================
# former registry33.py
# ==================================================================

"""Registry batch 33 — embedding-cluster analytics without pairwise
joins: algebraic cohesion/separation and nearest-centroid label
agreement. Both run on exact-integer quantized vectors (1e-6 units),
so every cross-row sum is order-independent and the results are
bit-identical across engines and partitionings — the discipline that
makes vector analytics oracle-checkable at all.
"""


from pyspark.sql import DataFrame, SparkSession

from datas_spark.io.sources import read_table
from datas_spark.operators.clustering import (
    cluster_cohesion,
    nearest_centroid_accuracy,
)
from datas_spark.registry_core import register

_E_CTE = r"""
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS d,
             round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
      FROM embeddings
    ), sums AS (
      SELECT label, d, sum(x)::BIGINT AS s FROM e GROUP BY 1, 2
    ), cnt AS (
      SELECT label, count(*)::BIGINT AS n_points FROM embeddings GROUP BY 1
    )
"""


@register(
    "cluster_cohesion",
    oracle=_E_CTE
    + """
    , ssq AS (
      SELECT label, sum(x * x)::DECIMAL(38,0) AS qq FROM e GROUP BY 1
    ), nrm AS (
      SELECT label, sum(s * s)::DECIMAL(38,0) AS nn FROM sums GROUP BY 1
    ), g AS (
      SELECT d, sum(s)::BIGINT AS gd FROM sums GROUP BY 1
    ), cx AS (
      SELECT label,
             sum(s::DECIMAL(38,0) * gd::DECIMAL(38,0))::DECIMAL(38,0) AS sg
      FROM sums JOIN g USING (d) GROUP BY 1
    ), tot AS (
      SELECT count(*)::BIGINT AS ntot FROM embeddings
    )
    SELECT c.label, c.n_points,
           CASE WHEN c.n_points > 1 THEN
             round((nrm.nn::DOUBLE - ssq.qq::DOUBLE)
                   / (c.n_points * (c.n_points - 1)) / 1e12, 6)
           END AS mean_pair_dot,
           round(sqrt(nrm.nn::DOUBLE) / c.n_points / 1e6, 6) AS centroid_norm,
           round(cx.sg::DOUBLE / (c.n_points * t.ntot) / 1e12, 6)
             AS centroid_dot_global
    FROM cnt c
    JOIN ssq USING (label) JOIN nrm USING (label) JOIN cx USING (label)
    CROSS JOIN tot t
    """,
)
def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-cluster mean pairwise dot product via the identity
    Σ_{i≠j} vᵢ·vⱼ = ||Σv||² − Σ||v||² — O(n) combinable aggregates
    where the naive formulation is an O(n²) self-join. Plus centroid
    norm and centroid·global-centroid separation. The cluster-quality
    triple every embedding-dedup/KMeans pipeline reads before trusting
    its clusters."""
    emb = read_table(spark, sf_dir, "embeddings")
    return cluster_cohesion(emb, "label", "embedding")


@register(
    "nearest_centroid_labels",
    oracle=_E_CTE
    + """
    , cent AS (
      SELECT s.label AS clabel,
             list(s.s::DOUBLE / c.n_points ORDER BY s.d) AS cvec
      FROM sums s JOIN cnt c USING (label)
      GROUP BY s.label, c.n_points
    ), pts AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            v -> round(v::DOUBLE * 1000000)::BIGINT) AS q
      FROM embeddings
    ), scored AS (
      SELECT p.vec_id, p.label, c.clabel,
             list_sum(list_transform(range(1, len(p.q) + 1),
                      i -> p.q[i]::DOUBLE * c.cvec[i])) AS dot
      FROM pts p CROSS JOIN cent c
    ), best AS (
      SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dot DESC, clabel ASC) AS r
      FROM scored
    )
    SELECT label, count(*)::BIGINT AS n_points,
           count(CASE WHEN label = clabel THEN 1 END)::BIGINT AS n_own,
           round(count(CASE WHEN label = clabel THEN 1 END)::DOUBLE
                 / count(*) * 100, 6) AS own_centroid_pct
    FROM best WHERE r = 1 GROUP BY label
    """,
)
def q_nearest_centroid_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen: per label, how many points sit closest (by
    dot product) to their OWN label centroid. Centroids come from the
    exact-integer sums; assignment is a map-side fold over one packed
    broadcast centroid array — the scoring scan never shuffles, so the
    pass costs one read of the vectors regardless of cluster count."""
    emb = read_table(spark, sf_dir, "embeddings")
    return nearest_centroid_accuracy(emb, "label", "embedding")

# ==================================================================
# former registry34.py
# ==================================================================

"""Registry batch 34 — pipeline observability + the JL scale path:
random-projection dimensionality reduction (PCA's fit-free twin),
per-source dedup-rate reporting, and the declared-vs-detected language
confusion matrix (label-quality audit for the `lang` column).
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators.clustering import random_projection
from datas_spark.operators.similarity import random_hyperplanes
from datas_spark.oracle_shared import LANG_ORACLE as _LANG_ORACLE  # leaf module (no chain re-entry)
from datas_spark.registry_core import register

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

# ==================================================================
# former registry44.py
# ==================================================================

"""Registry batch 44 — cross-source plagiarism matrix and a rank-free
composite quality index.

The plagiarism matrix aggregates near-dup PAIRS by source pair —
within-source duplication is republication noise; CROSS-source
duplication is syndication/scraping and decides which feed to drop.
The composite index demonstrates rank-free score fusion: every signal
maps to a decile via broadcast thresholds (no global percent_rank
window over the corpus), then a weighted mean fuses them.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens
from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.registry_core import register

_PAIRS_CTE = r"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
          i -> array_to_string((string_split_regex(trim(text), '\s+'))[i:i+2], ' ')))
          AS grams
      FROM documents
    ), ex AS (
      SELECT doc_id, len(grams) AS n, unnest(grams) AS s FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
      HAVING shared / (na + nb - shared) >= 0.2
    )
"""


@register(
    "cross_source_dup_matrix",
    oracle=_PAIRS_CTE
    + """
    SELECT least(da.source, db.source) AS src_lo,
           greatest(da.source, db.source) AS src_hi,
           count(*)::BIGINT AS n_pairs
    FROM pairs p
    JOIN documents da ON p.id_a = da.doc_id
    JOIN documents db ON p.id_b = db.doc_id
    WHERE da.source != db.source
    GROUP BY 1, 2
    """,
)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which feeds copy each other: near-dup pairs (n-gram Jaccard ≥
    0.2) whose endpoints live in DIFFERENT sources, aggregated into a
    canonical (src_lo, src_hi) matrix. Within-source pairs are
    excluded — republication inside one feed is a different problem
    than syndication across feeds.

    The pair frame is orders of magnitude smaller than the corpus;
    the two id→source joins broadcast the (id, source) projection per
    AQE, and the matrix is ≤ C(|sources|, 2) rows."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("__sa") != F.col("__sb"))
        .groupBy(
            F.least("__sa", "__sb").alias("src_lo"),
            F.greatest("__sa", "__sb").alias("src_hi"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


_DECILES = [i / 10.0 for i in range(1, 10)]  # 9 interior cut points


@register(
    "composite_quality_index",
    oracle=r"""
    WITH sig AS (
      SELECT doc_id, n_chars::DOUBLE AS len_sig,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE AS tok_sig,
             (len(list_distinct(string_split_regex(trim(lower(text)), '\s+')))::DOUBLE
              / len(string_split_regex(trim(text), '\s+'))) AS ttr_sig
      FROM documents
    ), thr AS (
      SELECT list_transform(quantile_cont(len_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_len,
             list_transform(quantile_cont(tok_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_tok,
             list_transform(quantile_cont(ttr_sig, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                            x -> round(x, 6)) AS t_ttr
      FROM sig
    )
    SELECT s.doc_id,
           (1 + len(list_filter(t.t_len, x -> s.len_sig > x)))::BIGINT AS d_len,
           (1 + len(list_filter(t.t_tok, x -> s.tok_sig > x)))::BIGINT AS d_tok,
           (1 + len(list_filter(t.t_ttr, x -> s.ttr_sig > x)))::BIGINT AS d_ttr,
           round(((1 + len(list_filter(t.t_len, x -> s.len_sig > x)))
                + (1 + len(list_filter(t.t_tok, x -> s.tok_sig > x)))
                + (1 + len(list_filter(t.t_ttr, x -> s.ttr_sig > x))))
                / 3.0, 6) AS composite
    FROM sig s CROSS JOIN thr t
    """,
)
def q_composite_quality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-free composite quality index: three signals (length, token
    count, unique-token ratio) each map to a decile 1–10 by counting
    how many of NINE broadcast percentile cut points the value
    exceeds, and the composite is their mean. The fusion pattern that
    replaces a global percent_rank window (one reducer sorting the
    corpus, three times) with one percentile buffer per signal and a
    map-side expression — the difference between a day and a minute
    at 10⁹ docs.

    Cut points round to 6 dp before comparison (engine-identical
    decile membership, the repo's standard threshold discipline)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = word_tokens("text")
    ttr = F.size(F.array_distinct(word_tokens(F.lower("text")))).cast(
        "double"
    ) / F.size(toks)
    sig = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("len_sig"),
        F.size(toks).cast("double").alias("tok_sig"),
        ttr.alias("ttr_sig"),
    )
    thr = sig.agg(
        *[
            F.array(
                *[
                    F.round(F.percentile(F.col(c), F.lit(p)), 6)
                    for p in _DECILES
                ]
            ).alias(f"t_{c[:3]}")
            for c in ("len_sig", "tok_sig", "ttr_sig")
        ]
    )

    def decile(sig_col: str, thr_col: str) -> F.Column:
        return (
            1
            + F.size(
                F.filter(F.col(thr_col), lambda x: F.col(sig_col) > x)
            )
        ).cast("long")

    d_len = decile("len_sig", "t_len")
    d_tok = decile("tok_sig", "t_tok")
    d_ttr = decile("ttr_sig", "t_ttr")
    return sig.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        d_len.alias("d_len"),
        d_tok.alias("d_tok"),
        d_ttr.alias("d_ttr"),
        F.round((d_len + d_tok + d_ttr) / F.lit(3.0), 6).alias("composite"),
    )


# ==================================================================
# round 6: product-quantization ANN (compressed-domain ADC scan)
# ==================================================================

_PQ_SUB = "list_transform(e.embedding[t.j*8+1 : t.j*8+8], x -> x::DOUBLE)"


@register(
    "pq_topk",
    oracle=f"""
    WITH cb AS (
      SELECT t.j, e.vec_id AS code, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j) WHERE e.vec_id < 16
    ), cbn AS (
      SELECT j, code, sub,
             list_sum(list_transform(sub, x -> x*x)) AS n2
      FROM cb
    ), dsub AS (
      SELECT e.vec_id AS did, t.j, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j)
    ), asg AS (
      SELECT did, j, code, n2 FROM (
        SELECT d.did, d.j, c.code, c.n2,
               row_number() OVER (PARTITION BY d.did, d.j ORDER BY
                 round(list_sum(list_transform(range(1,9), i ->
                   (d.sub[i]-c.sub[i])*(d.sub[i]-c.sub[i]))), 6) + 0.0 ASC,
                 c.code ASC) AS rn
        FROM dsub d JOIN cbn c USING (j))
      WHERE rn = 1
    ), dn AS (
      SELECT did, list_sum(list(n2 ORDER BY j)) AS dn2 FROM asg GROUP BY did
    ), qsub AS (
      SELECT e.vec_id AS qid, t.j, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j) WHERE e.vec_id < 3
    ), qn AS (
      SELECT vec_id AS qid,
             sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS qnorm
      FROM embeddings WHERE vec_id < 3
    ), ipj AS (
      SELECT q.qid, a.did, a.j,
             list_sum(list_transform(range(1,9), i -> q.sub[i]*c.sub[i])) AS dotj
      FROM qsub q
      JOIN asg a ON a.j = q.j
      JOIN cbn c ON c.j = a.j AND c.code = a.code
    ), approx AS (
      SELECT i.qid, i.did,
             round(list_sum(list(i.dotj ORDER BY i.j))
                   / (qn.qnorm * sqrt(dn.dn2)), 6) + 0.0 AS s
      FROM ipj i JOIN qn USING (qid) JOIN dn USING (did)
      WHERE qn.qnorm > 0 AND dn.dn2 > 0
      GROUP BY i.qid, i.did, qn.qnorm, dn.dn2
    ), cand AS (
      SELECT qid, did FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, did ASC) AS rn
        FROM approx)
      WHERE rn <= 80
    ), rer AS (
      SELECT c.qid AS q_vec_id, c.did AS d_vec_id,
             {{cos}} AS cos
      FROM cand c JOIN embeddings d ON d.vec_id = c.did
                  JOIN embeddings q ON q.vec_id = c.qid
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM rer) WHERE rank <= 10
    """.format(cos=_IVF_COS_SQL.format(a='d', b='q')),
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 — the FAISS
    ``IVFPQ`` PQ half): 64-dim vectors encoded as 8 one-byte codes
    (32× compression) against fixed sample codebooks (subvectors of
    vec_id < 16, the ``ivf_topk_fixed`` determinism trick), scored in
    the compressed domain via per-query ADC lookup tables, then
    exact-rerank of the 8·k survivors. The whole approximate pass is
    SQL-expressible, so the driver hash-checks codes, LUT scores, the
    candidate cut AND the rerank. Recall@10 ≈ 0.9 at this setting on
    the (near-random — ANN-adversarial) test embeddings."""
    from datas_spark.operators import similarity as SIM
    from datas_spark.operators.artifacts import pq_index_artifact

    emb = read_table(spark, sf_dir, "embeddings")
    cbs = emb.where("vec_id < 16").select(F.col("vec_id").alias("code"), "embedding")
    # codes come from the materialize-once index artifact (built on
    # first touch per corpus fingerprint); the full-recompute oracle
    # hash-proves artifact == re-encode every run
    enc = pq_index_artifact(spark, sf_dir).select("__did", "__codes", "__dn2")
    return SIM.pq_topk_on_codes(
        enc, emb, emb.where("vec_id < 3"), cbs,
        "vec_id", "vec_id", "code", "embedding", m=8, k=10, oversample=8,
    )


@register(
    "ivfpq_topk",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < 8
    ), ca AS (
      SELECT e.vec_id AS did, c.cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='e', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings e CROSS JOIN cells c
    ), cassign AS (
      SELECT did, cell FROM ca WHERE rn = 1
    ), qp AS (
      SELECT q.vec_id AS qid, c.cell,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='q', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings q CROSS JOIN cells c
      WHERE q.vec_id < 3
    ), probes AS (
      SELECT qid, cell FROM qp WHERE rn <= 3
    ), cb AS (
      SELECT t.j, e.vec_id AS code, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j) WHERE e.vec_id < 16
    ), cbn AS (
      SELECT j, code, sub,
             list_sum(list_transform(sub, x -> x*x)) AS n2
      FROM cb
    ), dsub AS (
      SELECT e.vec_id AS did, t.j, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j)
    ), asg AS (
      SELECT did, j, code, n2 FROM (
        SELECT d.did, d.j, c.code, c.n2,
               row_number() OVER (PARTITION BY d.did, d.j ORDER BY
                 round(list_sum(list_transform(range(1,9), i ->
                   (d.sub[i]-c.sub[i])*(d.sub[i]-c.sub[i]))), 6) + 0.0 ASC,
                 c.code ASC) AS rn
        FROM dsub d JOIN cbn c USING (j))
      WHERE rn = 1
    ), dn AS (
      SELECT did, list_sum(list(n2 ORDER BY j)) AS dn2 FROM asg GROUP BY did
    ), qsub AS (
      SELECT e.vec_id AS qid, t.j, {_PQ_SUB} AS sub
      FROM embeddings e, range(0,8) t(j) WHERE e.vec_id < 3
    ), qn AS (
      SELECT vec_id AS qid,
             sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS qnorm
      FROM embeddings WHERE vec_id < 3
    ), ipj AS (
      SELECT q.qid, a.did, a.j,
             list_sum(list_transform(range(1,9), i -> q.sub[i]*c.sub[i])) AS dotj
      FROM qsub q
      JOIN asg a ON a.j = q.j
      JOIN cbn c ON c.j = a.j AND c.code = a.code
      JOIN cassign cs ON cs.did = a.did
      JOIN probes p ON p.qid = q.qid AND p.cell = cs.cell
    ), approx AS (
      SELECT i.qid, i.did,
             round(list_sum(list(i.dotj ORDER BY i.j))
                   / (qn.qnorm * sqrt(dn.dn2)), 6) + 0.0 AS s
      FROM ipj i JOIN qn USING (qid) JOIN dn USING (did)
      WHERE qn.qnorm > 0 AND dn.dn2 > 0
      GROUP BY i.qid, i.did, qn.qnorm, dn.dn2
    ), cand AS (
      SELECT qid, did FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, did ASC) AS rn
        FROM approx)
      WHERE rn <= 80
    ), rer AS (
      SELECT c.qid AS q_vec_id, c.did AS d_vec_id,
             {{cos}} AS cos
      FROM cand c JOIN embeddings d ON d.vec_id = c.did
                  JOIN embeddings q ON q.vec_id = c.qid
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM rer) WHERE rank <= 10
    """.format(cos=_IVF_COS_SQL.format(a='d', b='q')),
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the canonical 100 TB vector-search layout (FAISS
    ``IVFPQ``): fixed sample coarse quantizer (cells = vec_id < 8)
    partitions the corpus into inverted lists, PQ codes (codebooks =
    subvectors of vec_id < 16) compress each list 32×, and each query
    scans only its 3 probed lists in the compressed domain before the
    exact rerank. Cell assignment, codes, ADC scores, candidate cut and
    rerank ALL hash-check — the entire two-level index composition is
    SQL-replayed."""
    from datas_spark.operators import similarity as SIM
    from datas_spark.operators.artifacts import pq_index_artifact

    emb = read_table(spark, sf_dir, "embeddings")
    cells = emb.where("vec_id < 8").select(F.col("vec_id").alias("cell"), "embedding")
    cbs = emb.where("vec_id < 16").select(F.col("vec_id").alias("code"), "embedding")
    # the (codes + cell) index is the materialize-once artifact; the
    # full-recompute oracle hash-proves artifact == rebuild every run
    enc = pq_index_artifact(spark, sf_dir)
    return SIM.ivfpq_topk_on_index(
        enc, emb, emb.where("vec_id < 3"), cells, cbs,
        "vec_id", "vec_id", "cell", "code", "embedding",
        m=8, k=10, oversample=8, n_probe=3,
    )


# round 11: Lloyd-learned PQ codebooks (VERDICT r10 #2) — real FAISS
# trains per-subspace k-means codebooks; the hash-checkable Lloyd
# trainer makes the full train→encode→ADC→rerank layout replayable.
_PQL_M, _PQL_KS, _PQL_ROUNDS, _PQL_SUB = 4, 8, 2, 16


def _pq_lloyd_cbn_ctes() -> str:
    """The learned-codebook half: 4 per-subspace Lloyd chains + the
    ``cbn`` codebook table (j, code, sub, n2)."""
    from datas_spark.oracle_shared import lloyd_cte_sql

    m, ks, sub = _PQL_M, _PQL_KS, _PQL_SUB
    lloyds = ",".join(
        lloyd_cte_sql(
            "embeddings", "vec_id",
            f"embedding[{j * sub + 1}:{(j + 1) * sub}]",
            ks, _PQL_ROUNDS, sub, prefix=f"pl{j}",
        )
        for j in range(m)
    )
    cbn_union = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, c.j AS code, c.cv AS sub,"
        f" list_sum(list_transform(c.cv, x -> x*x)) AS n2 FROM pl{j}_cent c"
        for j in range(m)
    )
    return f"""{lloyds},
    cbn AS MATERIALIZED (
      {cbn_union}
    )"""


def _pq_adc_chain_ctes(
    cbn: str, p: str, n_cand: int = 80, k: int = 10, probe_joins: str = ""
) -> str:
    """The ADC scan + exact rerank against codebook CTE ``{cbn}``:
    emits ``{p}asg``/``{p}dn``/``{p}top (q_vec_id, d_vec_id, cos,
    rank<=k)``. Expects shared ``qsub``/``qn`` CTEs in scope;
    ``probe_joins`` (extra JOIN lines over aliases ``q``/``a``)
    restricts the scored pairs to IVF-probed cells."""
    sub, m = _PQL_SUB, _PQL_M
    return f"""{p}dsub AS (
      SELECT e.vec_id AS did, t.j,
             list_transform(e.embedding[t.j*{sub}+1 : t.j*{sub}+{sub}],
                            x -> x::DOUBLE) AS sub
      FROM embeddings e, range(0,{m}) t(j)
    ), {p}asg AS MATERIALIZED (
      SELECT did, j, code, n2 FROM (
        SELECT d.did, d.j, c.code, c.n2,
               row_number() OVER (PARTITION BY d.did, d.j ORDER BY
                 round(list_sum(list_transform(range(1,{sub + 1}), i ->
                   (d.sub[i]-c.sub[i])*(d.sub[i]-c.sub[i]))), 6) + 0.0 ASC,
                 c.code ASC) AS rn
        FROM {p}dsub d JOIN {cbn} c USING (j))
      WHERE rn = 1
    ), {p}dn AS (
      SELECT did, list_sum(list(n2 ORDER BY j)) AS dn2 FROM {p}asg GROUP BY did
    ), {p}ipj AS (
      SELECT q.qid, a.did, a.j,
             list_sum(list_transform(range(1,{sub + 1}), i -> q.sub[i]*c.sub[i])) AS dotj
      FROM qsub q
      JOIN {p}asg a ON a.j = q.j
      JOIN {cbn} c ON c.j = a.j AND c.code = a.code
      {probe_joins}
    ), {p}approx AS (
      SELECT i.qid, i.did,
             round(list_sum(list(i.dotj ORDER BY i.j))
                   / (qn.qnorm * sqrt(dn.dn2)), 6) + 0.0 AS s
      FROM {p}ipj i JOIN qn USING (qid) JOIN {p}dn dn USING (did)
      WHERE qn.qnorm > 0 AND dn.dn2 > 0
      GROUP BY i.qid, i.did, qn.qnorm, dn.dn2
    ), {p}cand AS (
      SELECT qid, did FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid ORDER BY s DESC, did ASC) AS rn
        FROM {p}approx)
      WHERE rn <= {n_cand}
    ), {p}rer AS (
      SELECT c.qid AS q_vec_id, c.did AS d_vec_id,
             {_IVF_COS_SQL.format(a='d', b='q')} AS cos
      FROM {p}cand c JOIN embeddings d ON d.vec_id = c.did
                     JOIN embeddings q ON q.vec_id = c.qid
    ), {p}top AS (
      SELECT q_vec_id, d_vec_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM {p}rer) WHERE rank <= {k}
    )"""


_PQ_QSUB_CTES = f"""qsub AS (
      SELECT e.vec_id AS qid, t.j,
             list_transform(e.embedding[t.j*{_PQL_SUB}+1 : t.j*{_PQL_SUB}+{_PQL_SUB}],
                            x -> x::DOUBLE) AS sub
      FROM embeddings e, range(0,{_PQL_M}) t(j) WHERE e.vec_id < 3
    ), qn AS (
      SELECT vec_id AS qid,
             sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS qnorm
      FROM embeddings WHERE vec_id < 3
    )"""


@register(
    "pq_topk_learned",
    oracle=f"""
    WITH {_pq_lloyd_cbn_ctes()}, {_PQ_QSUB_CTES},
    {_pq_adc_chain_ctes("cbn", "lq_")}
    SELECT q_vec_id, d_vec_id, cos, rank FROM lq_top
    """,
)
def q_pq_topk_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with LEARNED per-subspace Lloyd codebooks
    (`similarity.pq_topk_learned`) — the full FAISS ``PQ4`` layout
    end to end: 4 independent deterministic Lloyd runs over the
    16-dim subvector blocks train the codebooks, the corpus encodes
    against them, per-query ADC LUTs score the compressed domain, and
    the 8·k survivors exact-rerank. Training + encoding + ADC + rerank
    ALL replay in the oracle (4 unrolled Lloyd chains). The fixed
    sample-codebook variant stays as `pq_topk`."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.pq_topk_learned(
        emb, emb.where("vec_id < 3"), emb,
        "vec_id", "vec_id", "embedding", dim=64,
        m=_PQL_M, ks=_PQL_KS, n_rounds=_PQL_ROUNDS, k=10, oversample=8,
    )


def _ivfpq_learned_oracle() -> str:
    from datas_spark.oracle_shared import lloyd_cte_sql

    vc = lloyd_cte_sql("embeddings", "vec_id", "embedding", 8, 2, 64, prefix="vc")
    probe_joins = """JOIN vcas cs2 ON cs2.did = a.did
      JOIN vprobes p ON p.qid = q.qid AND p.cell = cs2.cell"""
    return f"""
    WITH {vc}, vcells AS (
      SELECT j AS cell, cv AS embedding FROM vc_cent
    ), vca AS (
      SELECT e.vec_id AS did, c.cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='e', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings e CROSS JOIN vcells c
    ), vcas AS MATERIALIZED (
      SELECT did, cell FROM vca WHERE rn = 1
    ), vqp AS (
      SELECT q.vec_id AS qid, c.cell,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='q', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings q CROSS JOIN vcells c
      WHERE q.vec_id < 3
    ), vprobes AS (
      SELECT qid, cell FROM vqp WHERE rn <= 3
    ), {_pq_lloyd_cbn_ctes().lstrip()}, {_PQ_QSUB_CTES},
    {_pq_adc_chain_ctes("cbn", "iv_", probe_joins=probe_joins)}
    SELECT q_vec_id, d_vec_id, cos, rank FROM iv_top
    """


@register("ivfpq_topk_learned", oracle=_ivfpq_learned_oracle())
def q_ivfpq_topk_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with BOTH quantizers Lloyd-learned
    (`similarity.ivfpq_topk_learned`) — the full FAISS ``IVF8,PQ4``
    training story: the coarse cells are the `ivf_topk_learned`
    deterministic Lloyd run, the fine codebooks are per-subspace Lloyd
    (`pq_codebooks_lloyd`), and cell assignment, codes, probes, ADC
    scores, candidate cut and rerank ALL replay in the oracle (five
    unrolled Lloyd chains total). The fixed sample-quantizer variant
    stays as `ivfpq_topk`."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.ivfpq_topk_learned(
        emb, emb.where("vec_id < 3"), emb,
        "vec_id", "vec_id", "embedding", dim=64,
        n_cells=8, cell_rounds=2,
        m=_PQL_M, ks=_PQL_KS, cb_rounds=_PQL_ROUNDS,
        k=10, oversample=8, n_probe=3,
    )


@register(
    "pq_recall_learned_vs_fixed",
    oracle=f"""
    WITH {_pq_lloyd_cbn_ctes()},
    cbf AS MATERIALIZED (
      SELECT j, code, sub, list_sum(list_transform(sub, x -> x*x)) AS n2
      FROM (
        SELECT t.j, e.vec_id AS code,
               list_transform(e.embedding[t.j*{_PQL_SUB}+1 : t.j*{_PQL_SUB}+{_PQL_SUB}],
                              x -> x::DOUBLE) AS sub
        FROM embeddings e, range(0,{_PQL_M}) t(j) WHERE e.vec_id < {_PQL_KS}
      )
    ), {_PQ_QSUB_CTES},
    {_pq_adc_chain_ctes("cbn", "lq_")},
    {_pq_adc_chain_ctes("cbf", "fq_")},
    q0 AS (
      SELECT vec_id AS q_vec_id, embedding AS qv FROM embeddings WHERE vec_id < 3
    ), exsc AS (
      SELECT q0.q_vec_id, d.vec_id AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q0.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q0.qv) + 1),
                   i -> q0.qv[i]::DOUBLE * q0.qv[i]::DOUBLE)))), 6) AS cos
      FROM embeddings d CROSS JOIN q0
    ), ex AS MATERIALIZED (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM exsc) WHERE rank <= 10
    ), base AS MATERIALIZED (
      SELECT q_vec_id, count(*)::BIGINT AS n_exact FROM ex GROUP BY 1
    ), lh AS (
      SELECT ex.q_vec_id, count(*)::BIGINT AS n_hits
      FROM ex JOIN lq_top USING (q_vec_id, d_vec_id) GROUP BY 1
    ), fh AS (
      SELECT ex.q_vec_id, count(*)::BIGINT AS n_hits
      FROM ex JOIN fq_top USING (q_vec_id, d_vec_id) GROUP BY 1
    )
    SELECT 'learned' AS method, base.q_vec_id, base.n_exact,
           coalesce(lh.n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(lh.n_hits, 0) / base.n_exact::DOUBLE, 6) + 0.0 AS recall
    FROM base LEFT JOIN lh USING (q_vec_id)
    UNION ALL
    SELECT 'fixed' AS method, base.q_vec_id, base.n_exact,
           coalesce(fh.n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(fh.n_hits, 0) / base.n_exact::DOUBLE, 6) + 0.0 AS recall
    FROM base LEFT JOIN fh USING (q_vec_id)
    """,
)
def q_pq_recall_learned_vs_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PQ4×8 with Lloyd-learned codebooks vs the same
    geometry with fixed sample codebooks (first-8-vectors subvectors),
    both against the exact cosine top-10 — 'measure, don't guess' for
    the index-design choice itself; both retrieval chains, the exact
    chain, and the hit counting all hash-check.

    Measured finding (the reason this report exists): on the test
    embeddings — near-random, NO cluster structure — learned-mean
    codebooks LOSE cosine recall to full-norm sample codebooks
    (centroid means shrink ~1/√(cell size) toward the origin, so ADC
    dots lose discrimination) even while winning reconstruction MSE
    by ~30 % (`pq_distortion_learned_vs_fixed`, k-means' own
    objective). On clustered real-embedding corpora the shrinkage
    vanishes (cells are tight) and training wins both; on
    structureless data spend the training budget on spherical k-means
    or more codes instead."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 3")
    exact = SIM.cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=10)
    learned = SIM.pq_topk_learned(
        emb, q, emb, "vec_id", "vec_id", "embedding", dim=64,
        m=_PQL_M, ks=_PQL_KS, n_rounds=_PQL_ROUNDS, k=10, oversample=8,
    )
    cbs = emb.where(f"vec_id < {_PQL_KS}").select(
        F.col("vec_id").alias("code"), "embedding"
    )
    fixed = SIM.pq_topk_fixed(
        emb, q, cbs, "vec_id", "vec_id", "code", "embedding",
        m=_PQL_M, k=10, oversample=8,
    )
    rep = lambda method, approx: (
        SIM.ann_recall_report(exact, approx, "q_vec_id", "d_vec_id")
        .select(
            F.lit(method).alias("method"),
            "q_vec_id", "n_exact", "n_hits", "recall",
        )
    )
    return rep("learned", learned).unionAll(rep("fixed", fixed))


@register(
    "pq_distortion_learned_vs_fixed",
    oracle=f"""
    WITH {_pq_lloyd_cbn_ctes()},
    cbf AS MATERIALIZED (
      SELECT j, code, sub, list_sum(list_transform(sub, x -> x*x)) AS n2
      FROM (
        SELECT t.j, e.vec_id AS code,
               list_transform(e.embedding[t.j*{_PQL_SUB}+1 : t.j*{_PQL_SUB}+{_PQL_SUB}],
                              x -> x::DOUBLE) AS sub
        FROM embeddings e, range(0,{_PQL_M}) t(j) WHERE e.vec_id < {_PQL_KS}
      )
    ), dsub AS MATERIALIZED (
      SELECT e.vec_id AS did, t.j,
             list_transform(e.embedding[t.j*{_PQL_SUB}+1 : t.j*{_PQL_SUB}+{_PQL_SUB}],
                            x -> x::DOUBLE) AS sub
      FROM embeddings e, range(0,{_PQL_M}) t(j)
    ), dl AS (
      SELECT d.did, d.j,
             min(round(list_sum(list_transform(range(1,{_PQL_SUB + 1}), i ->
                 (d.sub[i]-c.sub[i])*(d.sub[i]-c.sub[i]))), 6) + 0.0) AS e2
      FROM dsub d JOIN cbn c USING (j) GROUP BY d.did, d.j
    ), df AS (
      SELECT d.did, d.j,
             min(round(list_sum(list_transform(range(1,{_PQL_SUB + 1}), i ->
                 (d.sub[i]-c.sub[i])*(d.sub[i]-c.sub[i]))), 6) + 0.0) AS e2
      FROM dsub d JOIN cbf c USING (j) GROUP BY d.did, d.j
    )
    SELECT 'learned' AS method, j, count(*)::BIGINT AS n_vectors,
           round(sum(CAST(round(e2 * 1000000.0) AS BIGINT))::DOUBLE
                 / (count(*) * 1000000)::DOUBLE, 6) + 0.0 AS mse
    FROM dl GROUP BY j
    UNION ALL
    SELECT 'fixed' AS method, j, count(*)::BIGINT AS n_vectors,
           round(sum(CAST(round(e2 * 1000000.0) AS BIGINT))::DOUBLE
                 / (count(*) * 1000000)::DOUBLE, 6) + 0.0 AS mse
    FROM df GROUP BY j
    """,
)
def q_pq_distortion_learned_vs_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace reconstruction MSE of the Lloyd-learned PQ
    codebooks vs the fixed sample codebooks
    (`similarity.pq_distortion_presplit`) — the k-means objective as
    a hash-checked readout. Learned wins ~30 % on the test embeddings
    BY CONSTRUCTION (Lloyd minimizes exactly this); paired with
    `pq_recall_learned_vs_fixed`, which shows the cosine-recall side
    of the same trade on structureless data. Per-point errors
    e6-quantize to integers so the corpus sums are order-free."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    cbn = F.broadcast(
        SIM.pq_codebooks_lloyd(
            emb, "vec_id", "embedding", 64,
            m=_PQL_M, ks=_PQL_KS, n_rounds=_PQL_ROUNDS,
        )
    )
    cbf = F.broadcast(
        SIM._pq_codebook(
            emb.where(f"vec_id < {_PQL_KS}").select(
                F.col("vec_id").alias("code"), "embedding"
            ),
            "code", "embedding", _PQL_M, _PQL_SUB,
        )
    )
    rep = lambda method, cb: (
        SIM.pq_distortion_presplit(emb, cb, "vec_id", "embedding", _PQL_M, _PQL_SUB)
        .select(F.lit(method).alias("method"), "j", "n_vectors", "mse")
    )
    return rep("learned", cbn).unionAll(rep("fixed", cbf))


@register(
    "ivf_recall_report",
    oracle=f"""
    WITH q0 AS (
      SELECT vec_id AS q_vec_id, embedding AS qv FROM embeddings WHERE vec_id < 3
    ), exsc AS (
      SELECT q0.q_vec_id, d.vec_id AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q0.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q0.qv) + 1),
                   i -> q0.qv[i]::DOUBLE * q0.qv[i]::DOUBLE)))), 6) AS cos
      FROM embeddings d CROSS JOIN q0
    ), ex AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM exsc) WHERE rank <= 10
    ), cells AS (
      SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < 8
    ), ac AS (
      SELECT e.vec_id AS did, c.cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='e', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings e CROSS JOIN cells c
    ), assign AS (
      SELECT did, cell FROM ac WHERE rn = 1
    ), qp AS (
      SELECT q.vec_id AS qid, c.cell,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_IVF_COS_SQL.format(a='q', b='c')} DESC, c.cell ASC) AS rn
      FROM embeddings q CROSS JOIN cells c
      WHERE q.vec_id < 3
    ), probes AS (
      SELECT qid, cell FROM qp WHERE rn <= 3
    ), apsc AS (
      SELECT p.qid AS q_vec_id, a.did AS d_vec_id,
             {_IVF_COS_SQL.format(a='d', b='q')} AS cos
      FROM probes p
      JOIN assign a USING (cell)
      JOIN embeddings d ON d.vec_id = a.did
      JOIN embeddings q ON q.vec_id = p.qid
    ), ap AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM apsc) WHERE rank <= 10
    ), base AS (
      SELECT q_vec_id, count(*)::BIGINT AS n_exact FROM ex GROUP BY 1
    ), hits AS (
      SELECT ex.q_vec_id, count(*)::BIGINT AS n_hits
      FROM ex JOIN ap USING (q_vec_id, d_vec_id) GROUP BY 1
    )
    SELECT base.q_vec_id, base.n_exact,
           coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(hits.n_hits, 0) / base.n_exact::DOUBLE, 6) + 0.0 AS recall
    FROM base LEFT JOIN hits USING (q_vec_id)
    """,
)
def q_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the fixed-quantizer IVF against the exact cosine
    top-10, per query — 'measure, don't guess' as a registered query:
    the report itself hash-checks (both retrieval chains AND the hit
    counting), so a recall regression from an index change shows up as
    a correctness diff, not a forgotten benchmark."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 3")
    exact = SIM.cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=10)
    cells = emb.where("vec_id < 8").select(F.col("vec_id").alias("cell"), "embedding")
    approx = SIM.ivf_topk_fixed(
        emb, q, cells, "vec_id", "vec_id", "cell", "embedding", k=10, n_probe=3
    )
    return SIM.ann_recall_report(exact, approx, "q_vec_id", "d_vec_id")


_MRL_COS16 = """
        round(
          list_sum(list_transform(range(1, 17),
                   i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, 17),
                   i -> {a}.embedding[i]::DOUBLE * {a}.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, 17),
                   i -> {b}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE)))), 6)
          + 0.0
"""


@register(
    "matryoshka_recall",
    oracle=f"""
    WITH exsc AS (
      SELECT q.vec_id AS q_vec_id, d.vec_id AS d_vec_id,
             {_IVF_COS_SQL.format(a='d', b='q')} AS cos
      FROM embeddings d CROSS JOIN embeddings q
      WHERE q.vec_id < 3
    ), ex AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM exsc) WHERE rank <= 10
    ), trsc AS (
      SELECT q.vec_id AS q_vec_id, d.vec_id AS d_vec_id,
             {_MRL_COS16.format(a='d', b='q')} AS cos
      FROM embeddings d CROSS JOIN embeddings q
      WHERE q.vec_id < 3
    ), tr AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM trsc) WHERE cos IS NOT NULL AND rank <= 10
    ), base AS (
      SELECT q_vec_id, count(*)::BIGINT AS n_exact FROM ex GROUP BY 1
    ), hits AS (
      SELECT ex.q_vec_id, count(*)::BIGINT AS n_hits
      FROM ex JOIN tr USING (q_vec_id, d_vec_id) GROUP BY 1
    )
    SELECT base.q_vec_id, base.n_exact,
           coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(hits.n_hits, 0) / base.n_exact::DOUBLE, 6) + 0.0 AS recall
    FROM base LEFT JOIN hits USING (q_vec_id)
    """,
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit: recall@10 of exact
    search over the FIRST 16 of 64 dims against full-dim exact search —
    the measurement that decides whether a 4× cheaper truncated index
    is good enough (MRL embeddings promise prefix-dims carry most of
    the signal; non-MRL embeddings like these test vectors mostly
    don't, and this query quantifies exactly that instead of assuming).
    Composes cosine_topk over sliced vectors with ann_recall_report;
    both chains and the hit counting hash-check."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 3")
    full = SIM.cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=10)
    sliced = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    qs = sliced.where("vec_id < 3")
    trunc = SIM.cosine_topk(sliced, qs, "vec_id", "vec_id", "embedding", k=10)
    return SIM.ann_recall_report(full, trunc, "q_vec_id", "d_vec_id")


# ---------------------------------------------------------------------------
# round 7: Johnson–Lindenstrauss random projection + its recall audit
# ---------------------------------------------------------------------------

_JL_SIGNS_SQL = """
    jl_signs AS (
      SELECT j, list_transform(range(0, 64), i ->
        CASE WHEN ('0x' || substr(md5('jl|' || i::VARCHAR || '|' || j::VARCHAR),
                                  1, 15))::BIGINT % 2 = 0
             THEN 1.0 ELSE -1.0 END) AS srow
      FROM (SELECT unnest(range(0, 16)) AS j)
    ), jl_proj AS (
      SELECT e.vec_id, s.j,
             round(list_sum(list_transform(range(1, 65),
                     i -> e.embedding[i]::DOUBLE * s.srow[i]))
                   / sqrt(16.0), 6) AS v
      FROM embeddings e CROSS JOIN jl_signs s
    ), jl AS (
      SELECT vec_id, list(v ORDER BY j) AS rp FROM jl_proj GROUP BY vec_id
    )
"""

_JL_COS_SQL = """
        round(
          list_sum(list_transform(range(1, 17),
                   i -> {a}.rp[i] * {b}.rp[i]))
          / (sqrt(list_sum(list_transform(range(1, 17),
                   i -> {a}.rp[i] * {a}.rp[i])))
           * sqrt(list_sum(list_transform(range(1, 17),
                   i -> {b}.rp[i] * {b}.rp[i])))), 6)
          + 0.0
"""


@register(
    "jl_projection",
    oracle="WITH " + _JL_SIGNS_SQL + """
    SELECT vec_id, rp FROM jl
    """,
)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic JL random projection 64 → 16 dims
    (`similarity.random_projection`): ±1 signs from md5(tag|i|j), one
    ordered index-fold per output coordinate, map-only — the sketching
    step that quarters every downstream ANN shuffle. The oracle
    regenerates the SAME sign matrix from the same md5 strings and
    replays the fold."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.random_projection(emb, "embedding", 64, 16).select("vec_id", "rp")


@register(
    "jl_recall_report",
    oracle="WITH " + _JL_SIGNS_SQL + f""",
    exsc AS (
      SELECT q.vec_id AS q_vec_id, d.vec_id AS d_vec_id,
             {_IVF_COS_SQL.format(a='d', b='q')} AS cos
      FROM embeddings d CROSS JOIN embeddings q
      WHERE q.vec_id < 3
    ), ex AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM exsc) WHERE rank <= 10
    ), jlsc AS (
      SELECT q.vec_id AS q_vec_id, d.vec_id AS d_vec_id,
             {_JL_COS_SQL.format(a='d', b='q')} AS cos
      FROM jl d CROSS JOIN jl q
      WHERE q.vec_id < 3
    ), jltop AS (
      SELECT q_vec_id, d_vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                     ORDER BY cos DESC, d_vec_id ASC) AS rank
        FROM jlsc) WHERE cos IS NOT NULL AND rank <= 10
    ), base AS (
      SELECT q_vec_id, count(*)::BIGINT AS n_exact FROM ex GROUP BY 1
    ), hits AS (
      SELECT ex.q_vec_id, count(*)::BIGINT AS n_hits
      FROM ex JOIN jltop USING (q_vec_id, d_vec_id) GROUP BY 1
    )
    SELECT base.q_vec_id, base.n_exact,
           coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(hits.n_hits, 0) / base.n_exact::DOUBLE, 6) + 0.0 AS recall
    FROM base LEFT JOIN hits USING (q_vec_id)
    """,
)
def q_jl_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of exact search in the 16-dim JL sketch space against
    full 64-dim exact search — the measured answer to 'is 4× cheaper
    good enough', exactly like `matryoshka_recall` but for the
    projection the JL lemma actually blesses (truncation keeps prefix
    dims; projection mixes ALL dims — on these near-random synthetic
    embeddings both land ~0.1-0.3 at k=10, which is precisely why the
    measurement, not the lemma's asymptotics, decides). Both chains
    and the hit counting hash-check end-to-end."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    proj = SIM.random_projection(emb, "embedding", 64, 16).select("vec_id", "rp")
    q = emb.where("vec_id < 3")
    full = SIM.cosine_topk(emb, q, "vec_id", "vec_id", "embedding", k=10)
    qp = proj.where("vec_id < 3")
    sketch = SIM.cosine_topk(proj, qp, "vec_id", "vec_id", "rp", k=10)
    return SIM.ann_recall_report(full, sketch, "q_vec_id", "d_vec_id")


# ---------------------------------------------------------------------------
# round 10: margin-based bitext mining (Artetxe & Schwenk 2019) —
# LSH-bucket-blocked candidates and neighborhoods, ratio margin.
# ---------------------------------------------------------------------------

_BTX_KNN, _BTX_TOP, _BTX_PLANES, _BTX_CAP = 4, 20, 4, 128


def _bitext_oracle() -> str:
    from datas_spark.oracle_shared import IVF_COS_SQL
    from datas_spark.registry_scoring import _LSH_DOT_SQL, _planes_values_sql

    fold = "list_reduce(list_prepend(0.0, {lst}), (a, b) -> a + b)"
    mean = fold.format(lst="list(cos ORDER BY r)")
    return f"""
    WITH pl AS (SELECT * FROM {_planes_values_sql(_BTX_PLANES)}),
    dots AS (
      SELECT e.vec_id, e.label, p.pid, {_LSH_DOT_SQL} AS dt
      FROM embeddings e CROSS JOIN pl p
    ), db AS (
      SELECT vec_id, label,
        sum(CASE WHEN dt >= 0 THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT
          AS bucket
      FROM dots GROUP BY vec_id, label
    ), sdb AS (
      SELECT vec_id, bucket FROM (
        SELECT vec_id, bucket,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY vec_id ASC) AS rn
        FROM db WHERE label % 2 = 0
      ) WHERE rn <= {_BTX_CAP}
    ), tdb AS (
      SELECT vec_id, bucket FROM (
        SELECT vec_id, bucket,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY vec_id ASC) AS rn
        FROM db WHERE label % 2 = 1
      ) WHERE rn <= {_BTX_CAP}
    ), cand AS MATERIALIZED (
      SELECT sb.vec_id AS sid, tb.vec_id AS tid,
             {IVF_COS_SQL.format(a='s', b='t')} AS cos
      FROM sdb sb JOIN tdb tb ON sb.bucket = tb.bucket
      JOIN embeddings s ON s.vec_id = sb.vec_id
      JOIN embeddings t ON t.vec_id = tb.vec_id
    ), ms AS (
      SELECT sid, {mean} / count(*)::DOUBLE AS m FROM (
        SELECT sid, cos,
               row_number() OVER (PARTITION BY sid
                                  ORDER BY cos DESC, tid ASC) AS r
        FROM cand
      ) WHERE r <= {_BTX_KNN} GROUP BY sid
    ), mt AS (
      SELECT tid, {mean} / count(*)::DOUBLE AS m FROM (
        SELECT tid, cos,
               row_number() OVER (PARTITION BY tid
                                  ORDER BY cos DESC, sid ASC) AS r
        FROM cand
      ) WHERE r <= {_BTX_KNN} GROUP BY tid
    )
    SELECT c.sid AS src_id, c.tid AS tgt_id, c.cos,
           CASE WHEN (ms.m + mt.m) / 2.0 != 0.0
                THEN round(c.cos / ((ms.m + mt.m) / 2.0), 6) END AS margin
    FROM cand c JOIN ms ON ms.sid = c.sid JOIN mt ON mt.tid = c.tid
    ORDER BY margin DESC, src_id ASC, tgt_id ASC LIMIT {_BTX_TOP}
    """


@register("bitext_margin_pairs", oracle=_bitext_oracle())
def q_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (`similarity.bitext_margin_pairs`,
    Artetxe & Schwenk 2019): even-label vectors play the source
    language, odd-label the target; candidates and the k-NN
    neighborhoods the ratio margin normalizes by are LSH-bucket
    blocked (seed-pinned planes — the miner never goes all-pairs);
    k-NN means fold in rank order. Top-20 mined pairs by margin."""
    from datas_spark.operators import similarity as SIM

    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.bitext_margin_pairs(
        emb.where(F.col("label") % 2 == 0),
        emb.where(F.col("label") % 2 == 1),
        "vec_id", "embedding",
        knn=_BTX_KNN, top_n=_BTX_TOP, n_planes=_BTX_PLANES,
        max_bucket_side=_BTX_CAP, dim=64,
    )
