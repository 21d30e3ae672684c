r"""Query registry, batch 8 (round 3): per-key weighted sampling,
z-score outlier gating, histogram-based decile assignment, and
per-dimension embedding standardization.

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_core import register
from datas_spark.registry5 import _MD5_UNIT_SQL


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
    learned-quantizer twin is ``ivf_topk_learned`` (registry2,
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


@register(
    "user_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT date_trunc('week', f.first_ts)::DATE AS cohort_week,
           (date_diff('day', date_trunc('week', f.first_ts),
                      date_trunc('week', e.ts)) // 7)::INT AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-event week,
    distinct actives counted per week offset — the standard
    product-analytics rollup. Two keyed aggregations and one join on
    user_id; the first-event frame is per-user (small side, AQE
    broadcasts when it fits)."""
    ev = read_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = ev.join(first, "user_id")
    cw = F.date_trunc("week", F.col("first_ts"))
    return (
        j.select(
            "user_id",
            cw.cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), cw) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


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
