"""Registry batch 39 — corpus cartography and behavioral statistics:
n-gram diversity (type-token ratio) per source, pairwise source
vocabulary overlap (which feeds syndicate each other), top bigram
collocations by PMI, and per-user inter-arrival burstiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions.text import word_tokens
from datas_spark.io.sources import read_table
from datas_spark.registry_core import register

_GRAM_SQL = r"""
      SELECT source, unnest(list_transform(
          range(1, greatest(len(w) - 2, 0) + 1),
          i -> array_to_string(w[i:i+2], ' '))) AS g
      FROM (SELECT source, string_split_regex(trim(text), '\s+') AS w
            FROM documents)
"""


@register(
    "ngram_diversity_by_source",
    oracle=f"""
    WITH ex AS ({_GRAM_SQL})
    SELECT source, count(*)::BIGINT AS n_grams,
           count(DISTINCT g)::BIGINT AS distinct_grams,
           round(count(DISTINCT g)::DOUBLE / count(*), 6) AS ttr
    FROM ex GROUP BY source
    """,
)
def q_ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram type-token ratio per source — the diversity screen: a
    feed whose TTR collapses is templated/boilerplate text (near-dup
    pressure) even when exact dedup finds nothing. One shingle pass;
    distinct counting on 8-byte gram hashes (the shuffle carries
    hashes, never gram strings; collision odds are the d²/2⁶⁵ already
    accepted across the dedup family)."""
    docs = read_table(spark, sf_dir, "documents")
    th = F.col("__th")
    grams = F.when(
        F.size(th) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - 3),
            lambda i: F.xxhash64(F.get(th, i), F.get(th, i + 1), F.get(th, i + 2)),
        ),
    )
    ex = (
        docs.select("source", word_tokens("text").alias("__w"))
        .select(
            "source", F.transform("__w", lambda t: F.xxhash64(t)).alias("__th")
        )
        # NON-distinct gram instances (TTR needs the raw count), unlike
        # the dedup family's distinct shingle sets
        .select("source", F.explode_outer(grams).alias("__g"))
        .where(F.col("__g").isNotNull())
    )
    return ex.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count_distinct("__g").cast("long").alias("distinct_grams"),
        F.round(
            F.count_distinct("__g").cast("double") / F.count(F.lit(1)), 6
        ).alias("ttr"),
    )


@register(
    "source_vocab_overlap",
    oracle=r"""
    WITH v AS (
      SELECT DISTINCT source,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), sizes AS (
      SELECT source, count(*)::BIGINT AS n FROM v GROUP BY 1
    ), shared AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS shared
      FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, s.shared,
           round(s.shared::DOUBLE / (sa.n + sb.n - s.shared), 6) AS jaccard
    FROM shared s
    JOIN sizes sa ON s.src_a = sa.source
    JOIN sizes sb ON s.src_b = sb.source
    WHERE s.shared::DOUBLE / (sa.n + sb.n - s.shared) >= 0.4
    """,
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cartography: pairwise Jaccard of source VOCABULARIES
    (distinct lowercase tokens), reported for pairs above 0.4 — feeds
    that syndicate each other's content light up before any doc-level
    dedup runs.

    Scale shape: the token→source inverted index has ≤ |sources| rows
    per token; pairs generate map-side from each token's sorted source
    set (≤ C(|sources|,2) per token, |sources| being small by
    definition), so the shuffle carries (pair, 1) counts — never a
    vocabulary self-join."""
    docs = read_table(spark, sf_dir, "documents")
    v = (
        docs.select(
            "source", F.explode_outer(word_tokens("text")).alias("__t")
        )
        .where(F.col("__t").isNotNull())
        .select("source", F.lower("__t").alias("__t"))
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    per_token = v.groupBy("__t").agg(
        F.array_sort(F.collect_set("source")).alias("__ss")
    )
    srcs = F.col("__ss")
    pairs = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + F.lit(2), F.size(srcs) - i - F.lit(1)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    shared = (
        per_token.where(F.size("__ss") >= 2)
        .select(F.explode(pairs).alias("__p"))
        .groupBy(F.col("__p.src_a").alias("src_a"), F.col("__p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("__n").alias("__nb"))
    jac = F.col("shared").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("shared")
    )
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .where(jac >= 0.4)
        .select("src_a", "src_b", "shared", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "bigram_pmi_top",
    oracle=r"""
    WITH bg AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
            FROM documents),
           unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)
    ), cbg AS (
      SELECT w1, w2, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, sum(c)::BIGINT AS n1 FROM cbg GROUP BY 1
    ), c2 AS (
      SELECT w2, sum(c)::BIGINT AS n2 FROM cbg GROUP BY 1
    ), tot AS (
      SELECT sum(c)::BIGINT AS n FROM cbg
    )
    SELECT w1, w2, c AS n_pair,
           round(ln(c::DOUBLE * t.n::DOUBLE / (c1.n1::DOUBLE * c2.n2::DOUBLE)), 6)
             AS pmi
    FROM cbg JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot t
    WHERE c >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)
def q_bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations: the 20 highest-PMI adjacent bigrams with
    count ≥ 5 — `ln(c(w1,w2)·N / (c(w1·)·c(·w2)))` over exact integer
    counts. The phrase-mining signal (fixed expressions, named
    entities) that complements per-source keyness.

    One bigram count pass; both marginals are re-aggregations of that
    frame; the top-20 runs as TakeOrderedAndProject (no global sort).
    PMI computes from exact integers and rounds to 6 dp before the
    (pmi, w1, w2) total order, so the cutoff is engine-identical."""
    docs = read_table(spark, sf_dir, "documents")
    bg = (
        docs.select(F.split(F.trim(F.lower("text")), r"\s+").alias("__w"))
        .select(
            F.explode_outer(
                F.when(
                    F.size("__w") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("__w") - 2),
                        lambda i: F.struct(
                            F.get(F.col("__w"), i).alias("w1"),
                            F.get(F.col("__w"), i + 1).alias("w2"),
                        ),
                    ),
                )
            ).alias("__g")
        )
        .where(F.col("__g").isNotNull())
        .select("__g.w1", "__g.w2")
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    c1 = cbg.groupBy("w1").agg(F.sum("c").alias("n1"))
    c2 = cbg.groupBy("w2").agg(F.sum("c").alias("n2"))
    tot = cbg.agg(F.sum("c").alias("n"))
    pmi = F.round(
        F.log(
            F.col("c").cast("double")
            * F.col("n").cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        ),
        6,
    )
    return (
        cbg.where(F.col("c") >= 5)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", F.col("c").alias("n_pair"), pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


@register(
    "user_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    )
    SELECT user_id, count(g)::BIGINT AS n_gaps,
           round(sum(g)::DOUBLE / count(g) / 1e6, 6) AS mean_gap_s,
           round(sqrt(greatest(
             (sum(g::DECIMAL(38,0) * g)::DOUBLE
              - sum(g)::DOUBLE * sum(g)::DOUBLE / count(g)) / count(g),
             0)) / 1e6, 6) AS std_gap_s
    FROM gaps WHERE g IS NOT NULL
    GROUP BY user_id HAVING count(g) >= 2
    """,
)
def q_user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness: mean and population-std of inter-event
    gaps (regular heartbeats vs bursty humans vs runaway bots). Gaps
    are EXACT integer microseconds from a per-user lag window (ordered
    by (ts, event_id) — a total order, so ties never flip the gaps);
    moments are exact integer sums (Σg bigint, Σg² DECIMAL(38,0)) and
    the two float divisions happen once per user row."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # events ts is NTZ
    g = us - F.lag(us).over(w)
    gaps = ev.select("user_id", g.alias("g")).where(F.col("g").isNotNull())
    sum_g = F.sum("g").cast("double")
    n = F.count("g").cast("double")
    var = (
        F.sum((F.col("g").cast("decimal(38,0)") * F.col("g"))).cast("double")
        - sum_g * sum_g / n
    ) / n
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("g").cast("long").alias("n_gaps"),
            F.round(sum_g / n / 1e6, 6).alias("mean_gap_s"),
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))) / 1e6, 6).alias(
                "std_gap_s"
            ),
        )
        .where(F.col("n_gaps") >= 2)
    )
