"""Distributed sketch queries: HLL/CMS/Bloom, rolling distinct, histogram-sketch quantiles, set algebra.

Consolidated from the former numeric registry batches 11, 17, 27, 58 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry11.py
# ==================================================================

"""Registry batch 11 — round-4 additions: the distributed-sketch
family (HyperLogLog, count-min, Bloom decontamination), physical
layout (Z-order clustering cells), key-skew profiling, and the Q18
large-volume-orders shape.

Every query embeds the exact literal constants (hash seeds, register
geometry, quantization steps) in BOTH the Spark plan and the DuckDB
twin, so the sketches hash-match bit-for-bit — same discipline as the
LSH hyperplane literals in registry_scoring.
"""


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


def _bloom_decontaminate_oracle(m_bits: int, k: int) -> str:
    """The (m, k)-parameterized DuckDB twin: the bitset is an explicit
    ``(word, bits)`` table probed by equi-join — i.e. the SAME physical
    shape as the engine's ``backend='join'`` path, so the hash-match
    checks the 60-bit word/bit packing contract end to end."""
    return f"""
    WITH bsh AS ({_BENCH_SH_SQL}),
    bpos AS (
      SELECT ('0x' || substr(md5(i::VARCHAR || ':' || g), 1, 15))::BIGINT
               % {m_bits} AS pos
      FROM bsh CROSS JOIN (SELECT unnest(range({k})) AS i)
    ), words AS (
      SELECT pos // 60 AS word, bit_or(1::BIGINT << (pos % 60)) AS bits
      FROM bpos GROUP BY 1
    ), psh AS ({_PROBE_SH_SQL}),
    ppos AS (
      SELECT doc_id, g,
        ('0x' || substr(md5(i::VARCHAR || ':' || g), 1, 15))::BIGINT
          % {m_bits} AS pos
      FROM psh CROSS JOIN (SELECT unnest(range({k})) AS i)
    ), shingle_hits AS (
      SELECT doc_id, g
      FROM ppos JOIN words w ON w.word = ppos.pos // 60
       AND ((w.bits >> (ppos.pos % 60)) & 1) = 1
      GROUP BY doc_id, g HAVING count(*) = {k}
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_shingles FROM psh GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, count(*) AS n_hits FROM shingle_hits GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_shingles::BIGINT AS n_shingles,
           h.n_hits::BIGINT AS n_hits,
           round(100.0 * h.n_hits / d.n_shingles, 4) AS hit_pct
    FROM per_doc d JOIN hits h USING (doc_id)
    """


def _bloom_decontaminate(
    spark: SparkSession, sf_dir: str, m_bits: int, k: int, backend: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 11 = 0")
    bench_sh = (
        bench.select(T.word_tokens("text").alias("__w"))
        .select(F.explode(T.shingles_of_tokens(F.col("__w"), _SHINGLE_N)).alias("g"))
        .distinct()
    )
    bitset = SK.bloom_bitset(bench_sh, "g", m_bits=m_bits, k=k)
    # Round-12 probe shape (guide §2.4 remove shuffles outright):
    # - NO .distinct() after the explode — `shingles_of_tokens` already
    #   array_distincts per doc, so (doc_id, g) rows are unique by
    #   construction and the distinct was a redundant full shuffle of
    #   every shingle string.
    # - membership as a BOOLEAN COLUMN folded into ONE combinable
    #   groupBy(doc_id) aggregate (count + conditional sum), instead of
    #   two aggregates over two re-expansions of the shingle pipeline
    #   joined back on doc_id. One pass over the probe scan, one
    #   exchange of per-doc count rows, zero joins; same rows out
    #   (inner-join semantics preserved by the n_hits >= 1 filter).
    probe_sh = (
        docs.where("doc_id % 11 != 0")
        .select("doc_id", T.word_tokens("text").alias("__w"))
        .select(
            "doc_id",
            F.explode(T.shingles_of_tokens(F.col("__w"), _SHINGLE_N)).alias("g"),
        )
    )
    if backend == "join":
        probed = SK.bloom_hit_join(
            probe_sh, "g", bitset, m_bits=m_bits, k=k, hit_col="__hit"
        )
    else:
        hit_of = SK.bloom_membership_expr(bitset, m_bits=m_bits, k=k)
        probed = probe_sh.withColumn("__hit", hit_of(F.col("g")))
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("__hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        .where(F.col("n_hits") >= 1)
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.round(
                F.lit(100.0) * F.col("n_hits") / F.col("n_shingles"), 4
            ).alias("hit_pct"),
        )
    )


@register("bloom_decontaminate", oracle=_bloom_decontaminate_oracle(_BLOOM_M, _BLOOM_K))
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: build a Bloom filter over the word-5-
    gram shingles of the benchmark slice (doc_id % 11 = 0), then probe
    every other document's shingles MAP-SIDE against the broadcast
    bitset; report docs with >= 1 (possibly-)overlapping shingle.

    This is the C4/Dolma decontamination shape: at 100 TB the probe is
    a full-speed scan (no join against the benchmark table), and the
    only shuffle is the per-doc hit count over hitting shingles.
    """
    return _bloom_decontaminate(spark, sf_dir, _BLOOM_M, _BLOOM_K, "literal")


_BLOOM_M_BIG = 1 << 24  # past BLOOM_LITERAL_MAX_BITS: the driver-literal
_BLOOM_K_BIG = 4        # compile would be a multi-MB expression — join backend


@register(
    "bloom_decontaminate_join",
    oracle=_bloom_decontaminate_oracle(_BLOOM_M_BIG, _BLOOM_K_BIG),
)
def q_bloom_decontaminate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bloom_decontaminate` at benchmark-union scale: m = 2^24 bits
    (the 10-bits/key sizing for a ~10^7-shingle benchmark carry), where
    the dense driver literal would be a multi-MB collect + expression
    parse. The probe instead runs k broadcast equi-joins against the
    sparse ``(word, bits)`` table (`sketches.bloom_hit_join`) — no
    driver materialization, still zero probe-side shuffles, so the same
    plan holds when the bitset is GiB-sized on a real cluster.

    Addresses VERDICT r5 "What's wrong" #1 (the literal ceiling).
    """
    return _bloom_decontaminate(spark, sf_dir, _BLOOM_M_BIG, _BLOOM_K_BIG, "join")


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


_ZW_BITS = 14  # 14-bit cells: morton < 2^28, composite key fits long
_ZW_CELLS = (1 << _ZW_BITS) - 1
_ZW_STEP = (500.0 - 0.0) / _ZW_CELLS
_ZW_ROWS = 500  # what-if zone size (models a parquet row-group)
_ZW_SHIFT = 1 << 31  # event_id tie-break lane (ids < 2^31)

# the part1by1 mask ladder as SQL: step1 = v & 0xFFFF;
# step2 = (step1 | step1<<8) & 0x00FF00FF; out = (step2 | step2<<4) & 0x0F0F0F0F
_P1B1_STEP2 = "((({v} & 65535) | (({v} & 65535) << 8)) & 16711935)"
_P1B1 = f"(({_P1B1_STEP2} | ({_P1B1_STEP2} << 4)) & 252645135)"


def _p1b1_sql(v: str, out: str) -> str:
    return f"{_P1B1.format(v=v)} AS {out}"


@register(
    "layout_skipping_whatif",
    oracle=f"""
    WITH keyed AS (
      SELECT value, user_id, event_id,
        greatest(0, least({_ZW_CELLS}, floor(value / {_ZW_STEP!r})))::BIGINT AS vc,
        greatest(0, least({_ZW_CELLS}, user_id))::BIGINT AS uc
      FROM events
    ), spread AS (
      SELECT value, user_id, event_id, vc, uc,
        {_p1b1_sql('vc', 'x2')}, {_p1b1_sql('uc', 'y2')}
      FROM keyed
    ), spread2 AS (
      SELECT value, user_id, event_id, vc,
        ((x2 | (x2 << 2)) & 858993459) AS x3,
        ((y2 | (y2 << 2)) & 858993459) AS y3
      FROM spread
    ), zkeyed AS (
      SELECT value, user_id, event_id, vc,
        (((x3 | (x3 << 1)) & 1431655765)
         | ((((y3 | (y3 << 1)) & 1431655765)) << 1)) AS zk
      FROM spread2
    ), layouts AS (
      SELECT 'natural' AS layout, event_id AS lk, value, user_id FROM zkeyed
      UNION ALL
      SELECT 'sort_value', vc * {_ZW_SHIFT} + event_id, value, user_id FROM zkeyed
      UNION ALL
      SELECT 'zorder', zk * {_ZW_SHIFT} + event_id, value, user_id FROM zkeyed
    ), ranked AS (
      SELECT layout, value, user_id,
             row_number() OVER (PARTITION BY layout ORDER BY lk) AS rn
      FROM layouts
    ), zones AS (
      SELECT layout, (rn - 1) // {_ZW_ROWS} AS zone,
             count(*) AS n_rows,
             min(value) AS minv, max(value) AS maxv,
             min(user_id) AS minu, max(user_id) AS maxu
      FROM ranked GROUP BY 1, 2
    ), m AS (
      SELECT count(*)::BIGINT AS n_rows_matching FROM events
      WHERE value BETWEEN 100 AND 120 AND user_id BETWEEN 40 AND 60
    )
    SELECT layout,
           count(*)::BIGINT AS n_zones,
           sum((maxv < 100 OR minv > 120 OR maxu < 40 OR minu > 60)::INT)::BIGINT
             AS n_zones_skipped,
           sum(CASE WHEN maxv < 100 OR minv > 120 OR maxu < 40 OR minu > 60
                    THEN n_rows ELSE 0 END)::BIGINT AS n_rows_skipped,
           n_rows_matching
    FROM zones CROSS JOIN m
    GROUP BY layout, n_rows_matching
    """,
)
def q_layout_skipping_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping what-if (`layout.zone_skipping_report`): would a
    scan with `value BETWEEN 100 AND 120 AND user_id BETWEEN 40 AND 60`
    prune more 500-row zones if events were laid out in natural order,
    range-sorted on value, or Z-ordered on (value, user_id)? Zone
    min/max stats model parquet row-group footers; the global what-if
    rank is the skew-resistant range-exchange mint (no partition-less
    window). The 100 TB design tool you run on a sample BEFORE paying
    for the table rewrite."""
    ev = read_table(spark, sf_dir, "events")
    vc = LAY.quantize(F.col("value"), 0.0, 500.0, bits=_ZW_BITS)
    uc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(_ZW_CELLS).cast("long"), F.col("user_id")),
    )
    shift = F.lit(_ZW_SHIFT).cast("long")
    layouts = {
        "natural": F.col("event_id").cast("long"),
        "sort_value": vc * shift + F.col("event_id"),
        "zorder": LAY.morton_key(vc, uc) * shift + F.col("event_id"),
    }
    return LAY.zone_skipping_report(
        ev,
        layouts,
        zone_rows=_ZW_ROWS,
        predicates={"value": (100.0, 120.0), "user_id": (40, 60)},
    )


# 10-bit cells for the curve comparison: user_id tops out at ~150 of
# 1024 cells and value granularity is 0.49 — plenty for zone
# boundaries, and the unrolled ladders stay shallow in BOTH engines
_HB_BITS = 10
_HB_CELLS = (1 << _HB_BITS) - 1
_HB_STEP = 500.0 / _HB_CELLS


def _hilbert_whatif_oracle() -> str:
    from datas_spark.operators.layout import hilbert_sql

    return f"""
    WITH h0src AS (
      SELECT value, user_id, event_id,
        greatest(0, least({_HB_CELLS}, floor(value / {_HB_STEP!r})))::BIGINT AS vc,
        greatest(0, least({_HB_CELLS}, user_id))::BIGINT AS uc
      FROM events
    ),
    {hilbert_sql('vc', 'uc', _HB_BITS)},
    withz AS (
      SELECT value, user_id, event_id, hkey,
        {_P1B1.format(v='vc')} AS x2, {_P1B1.format(v='uc')} AS y2
      FROM h{_HB_BITS}
    ), withz2 AS (
      SELECT value, user_id, event_id, hkey,
        ((x2 | (x2 << 2)) & 858993459) AS x3,
        ((y2 | (y2 << 2)) & 858993459) AS y3
      FROM withz
    ), zk AS (
      SELECT value, user_id, event_id, hkey,
        (((x3 | (x3 << 1)) & 1431655765)
         | ((((y3 | (y3 << 1)) & 1431655765)) << 1)) AS zkey
      FROM withz2
    ), layouts AS (
      SELECT 'zorder' AS layout, zkey * {_ZW_SHIFT} + event_id AS lk,
             value, user_id FROM zk
      UNION ALL
      SELECT 'hilbert', hkey * {_ZW_SHIFT} + event_id, value, user_id FROM zk
    ), ranked AS (
      SELECT layout, value, user_id,
             row_number() OVER (PARTITION BY layout ORDER BY lk) AS rn
      FROM layouts
    ), zones AS (
      SELECT layout, (rn - 1) // {_ZW_ROWS} AS zone,
             count(*) AS n_rows,
             min(value) AS minv, max(value) AS maxv,
             min(user_id) AS minu, max(user_id) AS maxu
      FROM ranked GROUP BY 1, 2
    ), m AS (
      SELECT count(*)::BIGINT AS n_rows_matching FROM events
      WHERE value BETWEEN 100 AND 120 AND user_id BETWEEN 40 AND 60
    )
    SELECT layout,
           count(*)::BIGINT AS n_zones,
           sum((maxv < 100 OR minv > 120 OR maxu < 40 OR minu > 60)::INT)::BIGINT
             AS n_zones_skipped,
           sum(CASE WHEN maxv < 100 OR minv > 120 OR maxu < 40 OR minu > 60
                    THEN n_rows ELSE 0 END)::BIGINT AS n_rows_skipped,
           n_rows_matching
    FROM zones CROSS JOIN m
    GROUP BY layout, n_rows_matching
    """


@register("hilbert_vs_zorder_skipping", oracle=_hilbert_whatif_oracle())
def q_hilbert_vs_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert vs Z-order, measured not folklored: the same 2-D
    predicate's zone-skipping counts under both curves
    (`layout.with_hilbert_key` — the unrolled Hamilton ladder as
    chained long projections — vs the morton key). Hilbert's unit-step
    locality avoids Z-order's diagonal jumps, so its zone min/max
    ranges are tighter; this query turns that claim into a hash-checked
    number (the 'liquid clustering' pitch, reproduced in two engines
    constant-for-constant)."""
    ev = read_table(spark, sf_dir, "events")
    vc = LAY.quantize(F.col("value"), 0.0, 500.0, bits=_HB_BITS)
    uc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(_HB_CELLS).cast("long"), F.col("user_id")),
    )
    keyed = LAY.with_hilbert_key(
        ev.withColumn("vc", vc).withColumn("uc", uc), "vc", "uc", _HB_BITS
    )
    shift = F.lit(_ZW_SHIFT).cast("long")
    layouts = {
        "zorder": LAY.morton_key(F.col("vc"), F.col("uc")) * shift + F.col("event_id"),
        "hilbert": F.col("hkey") * shift + F.col("event_id"),
    }
    return LAY.zone_skipping_report(
        keyed,
        layouts,
        zone_rows=_ZW_ROWS,
        predicates={"value": (100.0, 120.0), "user_id": (40, 60)},
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

# ==================================================================
# former registry17.py
# ==================================================================

"""Registry batch 17 — grouped and rolling-window approximate distinct
counts (HLL register reuse)."""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import sketches as SK
from datas_spark.registry_core import register

_GP = 12
_GM = 1 << _GP
_GW = 60 - _GP
_GR = _GW + 1
_GALPHA = 0.7213 / (1.0 + 1.079 / _GM)
_GNUM = _GALPHA * _GM * _GM * float(1 << _GR)

# shared per-group estimator SQL: expects CTE `regs(g, bucket, max_rho)`
_GROUP_EST_SQL = f"""
    agg AS (
      SELECT g, coalesce(sum(1::BIGINT << ({_GR} - max_rho)), 0) AS s,
             count(*) AS bu
      FROM regs GROUP BY g
    ), z AS (
      SELECT g, bu, s + ({_GM} - bu) * (1::BIGINT << {_GR}) AS zs FROM agg
    )
    SELECT g AS __OUT__, round(CASE WHEN ({_GNUM!r} / zs) <= {2.5 * _GM}
                      AND ({_GM} - bu) > 0
                 THEN {float(_GM)!r} * ln({float(_GM)!r} / ({_GM} - bu)::DOUBLE)
                 ELSE {_GNUM!r} / zs END, 4) AS estimate,
           bu::BIGINT AS buckets_used
    FROM z
"""


@register(
    "hll_users_by_type",
    oracle=f"""
    WITH h AS (
      SELECT event_type AS g,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, (h % {_GM})::INT AS bucket,
             (CASE WHEN (h >> {_GP}) = 0 THEN {_GW + 1}
                   ELSE instr(lpad(bin(h >> {_GP}), {_GW}, '0'), '1')
              END)::INT AS rho
      FROM h
    ), regs AS (
      SELECT g, bucket, max(rho) AS max_rho FROM r GROUP BY g, bucket
    ), {_GROUP_EST_SQL.replace("__OUT__", "event_type")}
    """,
)
def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT user_id) BY event_type — the grouped
    sketch: 2^p ints of state per group, map-side-combinable, vs the
    exact plan's shuffle of every (group, user) pair."""
    ev = read_table(spark, sf_dir, "events")
    out = SK.hll_grouped_cardinality(ev, ["event_type"], "user_id", p=_GP)
    return out.select(
        F.col("event_type"), "estimate", "buckets_used"
    )


_ROLL_W = 3  # trailing 3-day windows


@register(
    "hll_rolling_users",
    oracle=f"""
    WITH h AS (
      SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS g,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, (h % {_GM})::INT AS bucket,
             (CASE WHEN (h >> {_GP}) = 0 THEN {_GW + 1}
                   ELSE instr(lpad(bin(h >> {_GP}), {_GW}, '0'), '1')
              END)::INT AS rho
      FROM h
    ), day_regs AS (
      SELECT g, bucket, max(rho) AS max_rho FROM r GROUP BY g, bucket
    ), days AS (SELECT DISTINCT g AS w FROM day_regs
    ), fanned AS (
      SELECT d.g + off.o AS w, d.bucket, d.max_rho
      FROM day_regs d
      CROSS JOIN (SELECT unnest(range({_ROLL_W})) AS o) off
    ), regs AS (
      SELECT f.w AS g, bucket, max(max_rho) AS max_rho
      FROM fanned f JOIN days ON days.w = f.w
      GROUP BY f.w, bucket
    ), {_GROUP_EST_SQL.replace("__OUT__", "day_num")}
    """,
)
def q_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per trailing 3-day window WITHOUT re-scanning per
    window: each day is sketched once, and every window estimate is a
    register MERGE of its member days (`sketches.hll_rolling_
    cardinality`). |days| x 2^p state; the scan cost is one pass."""
    ev = read_table(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
        "user_id",
    )
    return SK.hll_rolling_cardinality(
        ev, "day_num", "user_id", window_units=_ROLL_W, p=_GP
    )


# ---------------------------------------------------------------------------
# event pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

_PATTERN = "view,click,purchase"


@register(
    "event_pattern_match",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, count(*)::BIGINT AS n_events,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           len(regexp_extract_all(s, '{_PATTERN}'))::BIGINT AS n_matches
    FROM seq
    WHERE len(regexp_extract_all(s, '{_PATTERN}')) > 0
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose event stream contains the CONSECUTIVE sequence
    view -> click -> purchase (no events in between), with the
    non-overlapping match count — MATCH_RECOGNIZE-lite over a
    deterministic per-user sequence string
    (`operators.events.event_pattern_matches`)."""
    from datas_spark.operators.events import event_pattern_matches

    ev = read_table(spark, sf_dir, "events")
    return event_pattern_matches(ev, _PATTERN)


# ---------------------------------------------------------------------------
# corpus drift (Jensen-Shannon term divergence)
# ---------------------------------------------------------------------------

_DRIFT_S = 0.5
_DRIFT_TOP = 20


@register(
    "corpus_term_drift",
    oracle=rf"""
    WITH ta AS (
      SELECT term, count(*)::BIGINT AS ca FROM (
        SELECT unnest(list_transform(string_split_regex(trim(text), '\s+'),
                                     w -> lower(w))) AS term
        FROM documents WHERE lang = 'en'
      ) WHERE len(term) > 0 GROUP BY term
    ), tb AS (
      SELECT term, count(*)::BIGINT AS cb FROM (
        SELECT unnest(list_transform(string_split_regex(trim(text), '\s+'),
                                     w -> lower(w))) AS term
        FROM documents WHERE lang = 'de'
      ) WHERE len(term) > 0 GROUP BY term
    ), j AS (
      SELECT coalesce(ta.term, tb.term) AS term, ca, cb
      FROM ta FULL OUTER JOIN tb ON ta.term = tb.term
    ), c AS (
      SELECT coalesce(sum(ca), 0)::BIGINT AS tta,
             coalesce(sum(cb), 0)::BIGINT AS ttb,
             count(*)::BIGINT AS v
      FROM j
    ), probs AS (
      SELECT term,
        (coalesce(ca, 0)::DOUBLE + {_DRIFT_S}) / (c.tta::DOUBLE + {_DRIFT_S} * c.v) AS pa,
        (coalesce(cb, 0)::DOUBLE + {_DRIFT_S}) / (c.ttb::DOUBLE + {_DRIFT_S} * c.v) AS pb
      FROM j CROSS JOIN c
    )
    SELECT term, round(pa, 8) AS p_a, round(pb, 8) AS p_b,
           round((pa * ln(pa / ((pa + pb) / 2.0))
                + pb * ln(pb / ((pa + pb) / 2.0))) / 2.0, 10) AS js_contrib
    FROM probs
    ORDER BY js_contrib DESC, term ASC LIMIT {_DRIFT_TOP}
    """,
)
def q_corpus_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where do the English and German slices of the corpus diverge:
    top terms by Jensen-Shannon contribution over smoothed unigram
    distributions — the drift audit you run between train/eval splits
    or pipeline versions (`operators.drift.term_drift`)."""
    from datas_spark.operators.drift import term_drift

    docs = read_table(spark, sf_dir, "documents")
    return term_drift(
        docs.where("lang = 'en'"),
        docs.where("lang = 'de'"),
        "text",
        top_n=_DRIFT_TOP,
        smoothing=_DRIFT_S,
    )

# ==================================================================
# former registry27.py
# ==================================================================

"""Registry batch 27 — histogram-sketch quantiles (the mergeable
quantile state completing the sketch suite) and weekly rank-delta
trending over event types.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import sketches as SK
from datas_spark.registry_core import register

_H_LO, _H_HI, _H_BINS = 0.0, 512.0, 256
_H_W = (_H_HI - _H_LO) / _H_BINS  # 2.0 — exact in binary
_H_QS = [0.5, 0.9, 0.99]
_QS_SQL = ", ".join(f"({q})" for q in _H_QS)


@register(
    "events_value_hist_quantiles",
    oracle=f"""
    WITH regs AS (
      SELECT least(greatest(floor((value::DOUBLE - {_H_LO}) / {_H_W}), 0),
                   {_H_BINS - 1})::INT AS bin,
             count(*)::BIGINT AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), walk AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             sum(cnt) OVER ()::BIGINT AS total
      FROM regs
    ), qs AS (SELECT q::DOUBLE AS q FROM (VALUES {_QS_SQL}) v(q)),
    hit AS (
      SELECT qs.q, min(w.bin) AS bin
      FROM walk w JOIN qs ON w.cum >= qs.q * w.total
      GROUP BY qs.q
    )
    SELECT h.q,
           round(least({_H_LO} + {_H_W} * (w.bin::DOUBLE
                 + (h.q * w.total::DOUBLE - (w.cum::DOUBLE - w.cnt::DOUBLE))
                   / w.cnt::DOUBLE), {_H_HI}), 6) AS est
    FROM hit h JOIN walk w ON w.bin = h.bin
    ORDER BY h.q
    """,
)
def q_events_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event values from a 256-bin histogram
    sketch — the MERGEABLE quantile path (merge = sum counts per bin)
    for streams and multi-segment corpora where the exact percentile
    buffer can't combine. Error is bounded by one bin width (2.0 here).

    Scale shape: the register build is a fixed-256-address groupBy
    (map-side combined, shuffle moves ≤ 256 rows); the cumulative walk
    and interpolation run on the 256-row register table; quantile
    targets are a broadcast literal (see ``sketches.histogram_*``)."""
    ev = read_table(spark, sf_dir, "events")
    regs = SK.histogram_registers(ev, "value", _H_LO, _H_HI, _H_BINS)
    return SK.histogram_quantiles(regs, _H_QS, _H_LO, _H_HI, _H_BINS)


@register(
    "weekly_type_rank_delta",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', ts)::DATE AS week, event_type,
             count(*)::BIGINT AS cnt
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT week, event_type, cnt,
             row_number() OVER (PARTITION BY week
                                ORDER BY cnt DESC, event_type ASC)::BIGINT AS rk
      FROM weekly
    )
    SELECT week, event_type, cnt, rk,
           (lag(rk) OVER (PARTITION BY event_type ORDER BY week) - rk)::BIGINT
             AS rank_delta
    FROM ranked ORDER BY week, rk
    """,
)
def q_weekly_type_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: each event type's popularity rank within
    every week, and how many positions it climbed (+) or fell (−)
    since the previous week — the rank-delta view behind "rising this
    week" panels. First-week deltas are NULL (no prior period).

    Scale shape: the weekly aggregate reduces to ≤ |weeks|·|types|
    rows before any window; the in-week rank partitions by week, the
    delta lag partitions by type — both metadata-sized."""
    ev = read_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "event_type"
    ).agg(F.count("*").cast("long").alias("cnt"))
    rk_w = Window.partitionBy("week").orderBy(F.desc("cnt"), F.asc("event_type"))
    ranked = weekly.withColumn("rk", F.row_number().over(rk_w).cast("long"))
    lag_w = Window.partitionBy("event_type").orderBy("week")
    return ranked.select(
        "week",
        "event_type",
        "cnt",
        "rk",
        (F.lag("rk").over(lag_w) - F.col("rk")).cast("long").alias("rank_delta"),
    ).orderBy("week", "rk")

# ==================================================================
# former registry58.py
# ==================================================================

"""Registry batch 58 — sketch set algebra (HLL pairwise overlap),
PSI feature-drift monitoring, and multi-touch linear attribution.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import drift as DR
from datas_spark.operators import events as EV
from datas_spark.operators import sketches as SK
from datas_spark.registry_core import register

_OP = 12
_OM = 1 << _OP
_OW = 60 - _OP
_OR = _OW + 1
_OALPHA = 0.7213 / (1.0 + 1.079 / _OM)
_ONUM = _OALPHA * _OM * _OM * float(1 << _OR)

# estimator over a register CTE `KEYS, bucket, max_rho` — emitted once
# for singles (KEYS=g) and once for pair unions (KEYS=g_a,g_b)
def _est_sql(regs: str, keys: str, out: str) -> str:
    return f"""
    {out}_agg AS (
      SELECT {keys}, coalesce(sum(1::BIGINT << ({_OR} - max_rho)), 0) AS s,
             count(*) AS bu
      FROM {regs} GROUP BY {keys}
    ), {out} AS (
      SELECT {keys},
             round(CASE WHEN ({_ONUM!r} / (s + ({_OM} - bu) * (1::BIGINT << {_OR})))
                          <= {2.5 * _OM} AND ({_OM} - bu) > 0
                   THEN {float(_OM)!r} * ln({float(_OM)!r} / ({_OM} - bu)::DOUBLE)
                   ELSE {_ONUM!r} / (s + ({_OM} - bu) * (1::BIGINT << {_OR}))
                   END, 4) AS est
      FROM {out}_agg
    )"""


@register(
    "hll_type_overlap",
    oracle=f"""
    WITH h AS (
      SELECT event_type AS g,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, (h % {_OM})::INT AS bucket,
             (CASE WHEN (h >> {_OP}) = 0 THEN {_OW + 1}
                   ELSE instr(lpad(bin(h >> {_OP}), {_OW}, '0'), '1')
              END)::INT AS rho
      FROM h
    ), regs AS (
      SELECT g, bucket, max(rho) AS max_rho FROM r GROUP BY g, bucket
    ), {_est_sql("regs", "g", "sest").lstrip()},
    pairs AS (
      SELECT a.g AS g_a, b.g AS g_b
      FROM (SELECT DISTINCT g FROM regs) a
      JOIN (SELECT DISTINCT g FROM regs) b ON a.g < b.g
    ), uregs AS (
      SELECT g_a, g_b, bucket, max(max_rho) AS max_rho
      FROM pairs JOIN regs ON regs.g = pairs.g_a OR regs.g = pairs.g_b
      GROUP BY 1, 2, 3
    ), {_est_sql("uregs", "g_a, g_b", "uest").lstrip()}
    SELECT u.g_a, u.g_b, ea.est AS est_a, eb.est AS est_b,
           u.est AS est_union,
           round(greatest(ea.est + eb.est - u.est, 0), 4) AS est_overlap
    FROM uest u
    JOIN sest ea ON ea.g = u.g_a
    JOIN sest eb ON eb.g = u.g_b
    """,
)
def q_hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate shared-user overlap between every pair of event
    types by HLL inclusion–exclusion (union = per-bucket register max
    — sketch merge, no re-scan). The audience-overlap matrix at
    2^{_OP} ints per group."""
    ev = read_table(spark, sf_dir, "events")
    return SK.hll_pairwise_overlap(ev, "event_type", "user_id", p=_OP)


_PSI_CUT = "2024-01-16"


@register(
    "events_value_psi",
    oracle=f"""
    WITH ref AS (
      SELECT value FROM events WHERE value IS NOT NULL AND ts < TIMESTAMP '{_PSI_CUT}'
    ), cur AS (
      SELECT value FROM events WHERE value IS NOT NULL AND ts >= TIMESTAMP '{_PSI_CUT}'
    ), cuts AS (
      SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c
      FROM ref
    ), rb AS (
      SELECT list_sum(list_transform((SELECT c FROM cuts),
               x -> CASE WHEN value > x THEN 1 ELSE 0 END))::INT AS bin,
             count(*) AS n_ref
      FROM ref GROUP BY 1
    ), cb AS (
      SELECT list_sum(list_transform((SELECT c FROM cuts),
               x -> CASE WHEN value > x THEN 1 ELSE 0 END))::INT AS bin,
             count(*) AS n_cur
      FROM cur GROUP BY 1
    ), bins AS (SELECT unnest(range(10))::INT AS bin
    ), tot AS (
      SELECT (SELECT sum(n_ref) FROM rb) AS tr, (SELECT sum(n_cur) FROM cb) AS tc
    )
    SELECT bin,
           coalesce(n_ref, 0)::BIGINT AS n_ref,
           coalesce(n_cur, 0)::BIGINT AS n_cur,
           round(((coalesce(n_cur, 0) / tc + 1e-6) - (coalesce(n_ref, 0) / tr + 1e-6))
                 * ln((coalesce(n_cur, 0) / tc + 1e-6)
                      / (coalesce(n_ref, 0) / tr + 1e-6)), 8) AS psi_term
    FROM bins LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin) CROSS JOIN tot
    """,
)
def q_events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin PSI terms for the event value distribution, weeks 1-2 as
    reference vs weeks 3+ — decile edges from the reference, shared
    bucketing, per-bin rows (order-deterministic; total = sum)."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ref = ev.where(F.col("ts") < _PSI_CUT)
    cur = ev.where(F.col("ts") >= _PSI_CUT)
    return DR.feature_psi(ref, cur, "value", bins=10)


@register(
    "view_linear_attribution",
    oracle="""
    WITH conv AS (
      SELECT event_id AS cid, user_id AS u, ts AS cts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id AS u, ts AS tts, json_extract(props, '$.k')::INT AS item
      FROM events WHERE event_type = 'view'
    ), m AS (
      SELECT c.cid, c.cents, t.item
      FROM conv c JOIN touch t
        ON c.u = t.u AND t.tts >= c.cts - INTERVAL 60 MINUTE AND t.tts < c.cts
    ), per AS (
      SELECT cid, count(*) AS n FROM m GROUP BY 1
    ), sh AS (
      SELECT m.item, (m.cents * 1000000) // per.n AS share
      FROM m JOIN per USING (cid)
    )
    SELECT item, sum(share)::BIGINT AS attributed_e6,
           count(*)::BIGINT AS n_touches
    FROM sh GROUP BY 1
    """,
)
def q_view_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-credit multi-touch attribution: every purchase's value
    splits across the user's views in the preceding hour; per-item
    totals are exact integer micro-cents (div shares — no float-sum
    ordering)."""
    ev = read_table(spark, sf_dir, "events")
    out = EV.linear_attribution(
        ev,
        "user_id",
        "ts",
        "event_type",
        touch_type="view",
        convert_type="purchase",
        item_col=F.get_json_object("props", "$.k").cast("int"),
        value_col="value",
        conv_id_col="event_id",
        horizon_minutes=60,
    )
    return out.select("item", "attributed_e6", "n_touches")
