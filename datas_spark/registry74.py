"""Registry batch 74 — packing-efficiency report and an exact
two-sample Kolmogorov–Smirnov screen for per-source length drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.registry_core import register

_PACK_BUDGET = 500


@register(
    "packing_efficiency",
    oracle=rf"""
    WITH t AS (
      SELECT source, doc_id,
        len(list_filter(
          string_split_regex(trim(regexp_replace(lower(text), '([^\w\s])', ' \1 ', 'g')), '\s+'),
          t -> t != ''))::BIGINT AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tokens,
        ((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens) // {_PACK_BUDGET})::BIGINT AS bin
      FROM t
    ), bins AS (
      SELECT source, bin, sum(n_tokens)::BIGINT AS fill
      FROM packed GROUP BY 1, 2
    )
    SELECT source,
           count(*)::BIGINT AS n_bins,
           sum(fill)::BIGINT AS total_tokens,
           round(sum(fill) / (count(*) * {_PACK_BUDGET}.0), 6) AS fill_ratio,
           min(fill)::BIGINT AS min_fill, max(fill)::BIGINT AS max_fill
    FROM bins GROUP BY source
    """,
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput report for the greedy packer: per source, how full
    the {_PACK_BUDGET}-token bins actually are (straddling docs can
    overfill a bin — fill_ratio > 1 flags where a split-on-boundary
    packer would win). Composes the proven pack plan with one grouped
    aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    packed = C.pack_sequences(
        docs, "doc_id", "text", budget=_PACK_BUDGET, shard_col="source"
    )
    bins = packed.groupBy("source", "bin").agg(
        F.sum("n_tokens").cast("long").alias("fill")
    )
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.round(
            F.sum("fill") / (F.count(F.lit(1)) * float(_PACK_BUDGET)), 6
        ).alias("fill_ratio"),
        F.min("fill").cast("long").alias("min_fill"),
        F.max("fill").cast("long").alias("max_fill"),
    )


@register(
    "source_length_ks",
    oracle="""
    WITH lens AS (
      SELECT source, n_chars FROM documents
    ), grid AS (
      SELECT DISTINCT n_chars AS l FROM lens
    ), sl AS (
      SELECT source, n_chars AS l, count(*)::BIGINT AS c
      FROM lens GROUP BY 1, 2
    ), totals AS (
      SELECT source, sum(c)::BIGINT AS ns FROM sl GROUP BY source
    ), gtot AS (
      SELECT count(*)::BIGINT AS ng FROM lens
    ), gcum AS (
      SELECT l, sum(cnt) OVER (ORDER BY l
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
      FROM (SELECT l, (SELECT count(*) FROM lens WHERE n_chars = g.l)::BIGINT AS cnt
            FROM grid g)
    ), scum AS (
      SELECT t.source, g.l,
             sum(coalesce(sl.c, 0)) OVER (PARTITION BY t.source ORDER BY g.l
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scum
      FROM totals t CROSS JOIN grid g
      LEFT JOIN sl ON sl.source = t.source AND sl.l = g.l
    )
    SELECT s.source, t.ns AS n_docs,
           round(max(abs(s.scum * gt.ng - g.gcum * t.ns))
                 / (t.ns::DOUBLE * gt.ng), 6) AS ks_d
    FROM scum s
    JOIN gcum g USING (l)
    JOIN totals t ON t.source = s.source
    CROSS JOIN gtot gt
    GROUP BY s.source, t.ns, gt.ng
    """,
)
def q_source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between each
    source's doc-length distribution and the whole corpus: the max
    ECDF gap evaluated as EXACT cross-multiplied integers
    (|scum·N − gcum·n| — no float ECDFs to disagree about), one
    division at the end. The distribution-shape screen next to the
    mean/percentile drift checks.

    Scale shape: grids are per-distinct-length aggregate rows; the
    per-source cumulative window partitions on source. Cross size =
    |sources| × |distinct lengths| — aggregate-sized, not data-sized."""
    docs = read_table(spark, sf_dir, "documents")
    lens = docs.select("source", "n_chars")
    grid = lens.select(F.col("n_chars").alias("l")).distinct()
    sl = lens.groupBy(
        "source", F.col("n_chars").alias("l")
    ).agg(F.count(F.lit(1)).alias("c"))
    totals = sl.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    gtot = lens.agg(F.count(F.lit(1)).cast("long").alias("ng"))
    gcounts = lens.groupBy(F.col("n_chars").alias("l")).agg(
        F.count(F.lit(1)).alias("gc")
    )
    wg = Window.orderBy("l").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gcounts.select("l", F.sum("gc").over(wg).alias("gcum"))
    gridded = (
        totals.crossJoin(grid)
        .join(sl, ["source", "l"], "left")
        .select("source", "ns", "l", F.coalesce("c", F.lit(0)).alias("c"))
    )
    ws = Window.partitionBy("source").orderBy("l").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scum = gridded.select(
        "source", "ns", "l", F.sum("c").over(ws).alias("scum")
    )
    joined = scum.join(gcum, "l").join(F.broadcast(gtot))
    diff = F.abs(F.col("scum") * F.col("ng") - F.col("gcum") * F.col("ns"))
    return (
        joined.groupBy("source")
        .agg(
            F.any_value("ns").alias("n_docs"),
            F.round(
                F.max(diff) / (F.any_value("ns").cast("double") * F.any_value("ng")),
                6,
            ).alias("ks_d"),
        )
        .select("source", "n_docs", "ks_d")
    )
