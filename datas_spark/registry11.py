"""Registry batch 11 — round-4 additions: the distributed-sketch
family (HyperLogLog, count-min, Bloom decontamination), physical
layout (Z-order clustering cells), key-skew profiling, and the Q18
large-volume-orders shape.

Every query embeds the exact literal constants (hash seeds, register
geometry, quantization steps) in BOTH the Spark plan and the DuckDB
twin, so the sketches hash-match bit-for-bit — same discipline as the
LSH hyperplane literals in registry2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators import layout as LAY
from datas_spark.operators import profile as PROF
from datas_spark.operators import sketches as SK
from datas_spark.registry_core import register

# ---------------------------------------------------------------------------
# §2.9 north star — HyperLogLog approximate COUNT DISTINCT
# ---------------------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P
_HLL_R = _HLL_W + 1
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# the full numerator constant, computed once in Python and embedded as
# the SAME literal on both engines (float-parity by construction)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_R)

_HLL_REGS_SQL = f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT (h % {_HLL_M})::INT AS bucket,
             (CASE WHEN (h >> {_HLL_P}) = 0 THEN {_HLL_W + 1}
                   ELSE instr(lpad(bin(h >> {_HLL_P}), {_HLL_W}, '0'), '1')
              END)::INT AS rho
      FROM h
    )
    SELECT bucket, max(rho)::INT AS max_rho FROM r GROUP BY bucket
"""


@register("hll_user_registers", oracle=_HLL_REGS_SQL)
def q_hll_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over events.user_id (p=12): the shuffle
    carries <= 4096 rows per partition regardless of input size."""
    ev = read_table(spark, sf_dir, "events")
    return SK.hll_registers(ev, "user_id", p=_HLL_P)


@register(
    "hll_user_count",
    oracle=f"""
    WITH regs AS ({_HLL_REGS_SQL}),
    agg AS (
      SELECT coalesce(sum(1::BIGINT << ({_HLL_R} - max_rho)), 0) AS s,
             count(*) AS buckets_used
      FROM regs
    ), z AS (
      SELECT buckets_used,
             s + ({_HLL_M} - buckets_used) * (1::BIGINT << {_HLL_R}) AS z_scaled
      FROM agg
    )
    SELECT
      round(CASE WHEN ({_HLL_NUM!r} / z_scaled) <= {2.5 * _HLL_M}
                  AND ({_HLL_M} - buckets_used) > 0
             THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} /
                    ({_HLL_M} - buckets_used)::DOUBLE)
             ELSE {_HLL_NUM!r} / z_scaled END, 4) AS estimate,
      buckets_used::BIGINT AS buckets_used
    FROM z
    """,
)
def q_hll_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT user_id): exact-integer harmonic sum
    (order-independent, engine-reproducible) + linear-counting small-
    range correction."""
    ev = read_table(spark, sf_dir, "events")
    return SK.hll_cardinality(ev, "user_id", p=_HLL_P)


# ---------------------------------------------------------------------------
# §2.9 north star — count-min heavy-hitter estimates
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 512


@register(
    "cms_user_heavy",
    oracle=f"""
    WITH pos AS (
      SELECT i,
        ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
          % {_CMS_WIDTH} AS pos
      FROM events CROSS JOIN (SELECT unnest(range({_CMS_DEPTH})) AS i)
      WHERE user_id IS NOT NULL
    ), regs AS (
      SELECT i AS row, pos, count(*) AS cnt FROM pos GROUP BY i, pos
    ), probes AS (
      SELECT DISTINCT user_id FROM events
      WHERE user_id IS NOT NULL AND user_id % 7 = 0
    ), ppos AS (
      SELECT user_id, i,
        ('0x' || substr(md5(i::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
          % {_CMS_WIDTH} AS pos
      FROM probes CROSS JOIN (SELECT unnest(range({_CMS_DEPTH})) AS i)
    )
    SELECT p.user_id,
           min(coalesce(r.cnt, 0))::BIGINT AS est_count
    FROM ppos p LEFT JOIN regs r ON r.row = p.i AND r.pos = p.pos
    GROUP BY p.user_id
    """,
)
def q_cms_user_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for a probe set of user ids — the
    sketch (<= depth*width cells) is built in one combinable pass and
    broadcast to the probes; estimates are upper bounds."""
    ev = read_table(spark, sf_dir, "events")
    regs = SK.cms_registers(ev, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    probes = ev.where("user_id IS NOT NULL AND user_id % 7 = 0").select("user_id").distinct()
    return SK.cms_point_estimates(
        regs, probes, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )


# ---------------------------------------------------------------------------
# §2.9 north star — Bloom-filter benchmark decontamination
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 20  # ~9.6 bits/shingle at sf1 benchmark size: FPR stays
_BLOOM_K = 4        # negligible as the corpus scales (65 Ki bits was ~32%
_SHINGLE_N = 5      # FPR at sf0.1 — noise drowning the true overlaps)

# shared shingle CTE bodies (DuckDB): distinct word-5-grams per doc
_BENCH_SH_SQL = rf"""
      SELECT DISTINCT g FROM (
        SELECT unnest(list_transform(
            range(1, greatest(len(w) - {_SHINGLE_N - 1}, 0) + 1),
            i -> array_to_string(w[i:i+{_SHINGLE_N - 1}], ' '))) AS g
        FROM (SELECT string_split_regex(trim(text), '\s+') AS w
              FROM documents WHERE doc_id % 11 = 0))
"""
_PROBE_SH_SQL = rf"""
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(
            range(1, greatest(len(w) - {_SHINGLE_N - 1}, 0) + 1),
            i -> array_to_string(w[i:i+{_SHINGLE_N - 1}], ' '))) AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents WHERE doc_id % 11 != 0))
"""


@register(
    "bloom_decontaminate",
    oracle=f"""
    WITH bsh AS ({_BENCH_SH_SQL}),
    bpos AS (
      SELECT ('0x' || substr(md5(i::VARCHAR || ':' || g), 1, 15))::BIGINT
               % {_BLOOM_M} AS pos
      FROM bsh CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i)
    ), words AS (
      SELECT pos // 60 AS word, bit_or(1::BIGINT << (pos % 60)) AS bits
      FROM bpos GROUP BY 1
    ), psh AS ({_PROBE_SH_SQL}),
    ppos AS (
      SELECT doc_id, g,
        ('0x' || substr(md5(i::VARCHAR || ':' || g), 1, 15))::BIGINT
          % {_BLOOM_M} AS pos
      FROM psh CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i)
    ), shingle_hits AS (
      SELECT doc_id, g
      FROM ppos JOIN words w ON w.word = ppos.pos // 60
       AND ((w.bits >> (ppos.pos % 60)) & 1) = 1
      GROUP BY doc_id, g HAVING count(*) = {_BLOOM_K}
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_shingles FROM psh GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, count(*) AS n_hits FROM shingle_hits GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_shingles::BIGINT AS n_shingles,
           h.n_hits::BIGINT AS n_hits,
           round(100.0 * h.n_hits / d.n_shingles, 4) AS hit_pct
    FROM per_doc d JOIN hits h USING (doc_id)
    """,
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: build a Bloom filter over the word-5-
    gram shingles of the benchmark slice (doc_id % 11 = 0), then probe
    every other document's shingles MAP-SIDE against the broadcast
    bitset; report docs with >= 1 (possibly-)overlapping shingle.

    This is the C4/Dolma decontamination shape: at 100 TB the probe is
    a full-speed scan (no join against the benchmark table), and the
    only shuffle is the per-doc hit count over hitting shingles.
    """
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 11 = 0")
    bench_sh = (
        bench.select(T.word_tokens("text").alias("__w"))
        .select(F.explode(T.shingles_of_tokens(F.col("__w"), _SHINGLE_N)).alias("g"))
        .distinct()
    )
    bitset = SK.bloom_bitset(bench_sh, "g", m_bits=_BLOOM_M, k=_BLOOM_K)
    probe_sh = (
        docs.where("doc_id % 11 != 0")
        .select("doc_id", T.word_tokens("text").alias("__w"))
        .select(
            "doc_id",
            F.explode(T.shingles_of_tokens(F.col("__w"), _SHINGLE_N)).alias("g"),
        )
        .distinct()
    )
    per_doc = probe_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit_sh = SK.bloom_contains(probe_sh, "g", bitset, m_bits=_BLOOM_M, k=_BLOOM_K)
    hits = hit_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return per_doc.join(hits, "doc_id").select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.lit(100.0) * F.col("n_hits") / F.col("n_shingles"), 4).alias(
            "hit_pct"
        ),
    )


# ---------------------------------------------------------------------------
# layout — Z-order clustering cells
# ---------------------------------------------------------------------------

_ZQ_LO, _ZQ_HI, _ZQ_BITS = 0.0, 500.0, 16
_ZQ_STEP = (_ZQ_HI - _ZQ_LO) / ((1 << _ZQ_BITS) - 1)


@register(
    "events_zorder_cells",
    oracle=f"""
    WITH cells AS (
      SELECT
        greatest(0, least({(1 << _ZQ_BITS) - 1},
          floor((value - {_ZQ_LO!r}) / {_ZQ_STEP!r})))::BIGINT AS xc,
        greatest(0, least({(1 << _ZQ_BITS) - 1}, user_id))::BIGINT AS yc
      FROM events
    ), spread AS (
      SELECT xc, yc,
        -- part1by1(xc): mask-shift ladder, identical constants both engines
        ((((((xc & 65535) | ((xc & 65535) << 8)) & 16711935)
           | ((((xc & 65535) | ((xc & 65535) << 8)) & 16711935) << 4)) & 252645135))
          AS x2,
        ((((((yc & 65535) | ((yc & 65535) << 8)) & 16711935)
           | ((((yc & 65535) | ((yc & 65535) << 8)) & 16711935) << 4)) & 252645135))
          AS y2
      FROM cells
    ), spread2 AS (
      SELECT
        ((x2 | (x2 << 2)) & 858993459) AS x3,
        ((y2 | (y2 << 2)) & 858993459) AS y3
      FROM spread
    ), z AS (
      SELECT (((x3 | (x3 << 1)) & 1431655765)
              | ((((y3 | (y3 << 1)) & 1431655765)) << 1)) AS zkey
      FROM spread2
    )
    SELECT (zkey >> 24)::BIGINT AS zcell, count(*)::BIGINT AS n_rows
    FROM z GROUP BY 1
    """,
)
def q_events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order cell histogram over (value, user_id): the Morton key a
    `layout.zorder_write` run would cluster events on, rolled up to the
    top-8-bit cells. Pure int64 mask/shift — whole-stage codegen."""
    ev = read_table(spark, sf_dir, "events")
    xc = LAY.quantize(F.col("value"), _ZQ_LO, _ZQ_HI, bits=_ZQ_BITS)
    yc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit((1 << _ZQ_BITS) - 1).cast("long"), F.col("user_id")),
    )
    zkey = LAY.morton_key(xc, yc)
    return (
        ev.select(F.shiftright(zkey, 24).cast("long").alias("zcell"))
        .groupBy("zcell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# profiling — key skew diagnostics
# ---------------------------------------------------------------------------

@register(
    "events_key_skew",
    oracle="""
    WITH counts AS (
      SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY user_id
    ), tot AS (SELECT sum(cnt) AS total FROM counts)
    SELECT key, cnt::BIGINT AS cnt,
           round(100.0 * cnt / total, 4) AS share_pct
    FROM counts CROSS JOIN tot
    ORDER BY cnt DESC, key ASC LIMIT 20
    """,
)
def q_events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest user_ids with relative share — the salting
    candidates list (TakeOrderedAndProject, no global sort)."""
    ev = read_table(spark, sf_dir, "events")
    return PROF.heavy_keys(ev, "user_id", top_n=20)


@register(
    "events_skew_stats",
    oracle="""
    WITH counts AS (
      SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY user_id
    ), agg AS (
      SELECT sum(cnt)::BIGINT AS total_rows, count(*)::BIGINT AS n_keys,
             max(cnt)::BIGINT AS max_cnt, round(avg(cnt), 4) AS avg_cnt,
             round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
             round(quantile_cont(cnt, 0.99), 4) AS p99_cnt
      FROM counts
    )
    SELECT *, round(max_cnt / avg_cnt, 4) AS skew_ratio,
           greatest(1, ceil(max_cnt::DOUBLE / (total_rows::DOUBLE / 200.0)))::BIGINT
             AS suggested_salt
    FROM agg
    """,
)
def q_events_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row group-size distribution summary for events.user_id,
    including the suggested salt factor for a 200-partition shuffle."""
    ev = read_table(spark, sf_dir, "events")
    return PROF.skew_stats(ev, "user_id", shuffle_partitions=200)


# ---------------------------------------------------------------------------
# classic OLAP — Q18 large-volume orders
# ---------------------------------------------------------------------------

@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(o.o_totalprice AS DECIMAL(14,2)) AS o_totalprice,
           CAST(b.sum_qty AS DECIMAL(14,2)) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250, with
    customer attribution, top-100 by price.

    Scale shape: the HAVING filter reduces lineitem to a tiny key set
    BEFORE any join (aggregate pushdown by hand), both joins then run
    on the reduced side; DECIMAL sums keep the aggregate exact and
    order-independent; top-100 is TakeOrderedAndProject.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("o_totalprice"),
            F.col("sum_qty").cast("decimal(14,2)").alias("sum_qty"),
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )
