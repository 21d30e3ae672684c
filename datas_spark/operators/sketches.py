"""Distributed sketch operators — the approximate-analytics family a
100 TB corpus engine needs where an exact answer would shuffle the full
key space:

- **HyperLogLog** register tables + cardinality estimate (approximate
  COUNT DISTINCT in one map-side-combinable pass with 2^p ints of
  state, vs a full shuffle of every distinct key).
- **Count-min sketch** register tables + point-frequency estimates
  (approximate per-key counts with ``depth * width`` cells of state —
  heavy-hitter queries over keys too numerous to groupBy exactly).
- **Bloom filter** build + membership probe (decontamination: test
  100 TB of training docs against a benchmark set with a bitset that
  fits in a broadcast variable; no join against the benchmark table).

Scale design: every builder is a ``groupBy`` over a FIXED-SIZE register
address space (2^p buckets / depth*width cells / m_bits//60 words), so
partial aggregation does almost all the work map-side and the shuffle
moves at most the register table, never the data. Probes are pure
map-side expressions against a driver-materialized bitset (the sketch
is contractually tiny — that is the point of a sketch).

Determinism: all hashes are md5-prefix derived (`functions.text.hash60`)
so every register/bit is reproducible bit-for-bit in ANSI SQL — the
DuckDB oracles in registry11 compute identical sketches. A production
deployment would swap in ``xxhash64`` one function away; the register
algebra is unchanged.

Reference parity: muyu42/DataS has no sketch module (its dedup/select
pipeline is exact-only, `main.py` operates in-memory); this family is
part of the SURVEY §2.9 north-star additions for corpus-scale
dedup/contamination work.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datas_spark.functions.text import hash60

__all__ = [
    "hll_registers",
    "hll_cardinality",
    "hll_estimate_from_registers",
    "hll_grouped_registers",
    "hll_grouped_cardinality",
    "hll_rolling_cardinality",
    "cms_registers",
    "cms_point_estimates",
    "cms_join_size_estimate",
    "bloom_bitset",
    "bloom_contains",
    "bloom_membership_expr",
    "bloom_hit_join",
    "BLOOM_LITERAL_MAX_BITS",
    "histogram_registers",
    "histogram_quantiles",
    "hll_pairwise_overlap",
]

_HASH_BITS = 60  # hash60 width (md5 prefix that round-trips signed int64)
_WORD_BITS = 60  # bits per bloom word (bit 59 max keeps the long positive)


def _seeded_hash60(col: Column, seed: int) -> Column:
    """Independent hash function #seed: md5 over a seed-prefixed value.

    Mirrored in SQL as ``md5(seed || ':' || x)``.
    """
    return hash60(F.concat(F.lit(f"{seed}:"), col.cast("string")))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_registers(df: DataFrame, value_col: str, p: int = 12) -> DataFrame:
    """HLL register table for ``value_col``: one row per non-empty
    bucket, ``(bucket int, max_rho int)``.

    ``bucket`` is the low ``p`` bits of the 60-bit md5 hash; ``rho`` is
    the 1-based position of the leftmost set bit in the remaining
    ``60 - p`` bits (``w + 1`` when they are all zero, per Flajolet et
    al. 2007). NULL values are excluded (COUNT DISTINCT semantics).

    Scale: ``groupBy(bucket).agg(max(rho))`` over at most ``2^p`` keys —
    partial-max folds map-side, the shuffle carries <= 2^p rows per
    partition regardless of input size.
    """
    if not 8 <= p <= 18:
        raise ValueError(f"p must be in [8, 18], got {p}")
    w = _HASH_BITS - p
    hashed = df.where(F.col(value_col).isNotNull()).select(
        hash60(F.col(value_col).cast("string")).alias("__h")
    )
    bucket = (F.col("__h") % F.lit(1 << p)).cast("int")
    rest = F.shiftright(F.col("__h"), p)
    # leftmost-1 position via the binary rendering: lpad(bin(rest), w)
    # puts bit w-1 first, so instr(.., '1') == leading zeros + 1 == rho.
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.instr(F.lpad(F.bin(rest), w, "0"), "1"))
        .cast("int")
    )
    return (
        hashed.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_cardinality(df: DataFrame, value_col: str, p: int = 12) -> DataFrame:
    """Single-row approximate COUNT(DISTINCT value_col):
    ``(estimate double, buckets_used bigint)``.

    The harmonic sum is computed in EXACT integer arithmetic —
    ``sum(2^(R - rho))`` with ``R = w + 1`` the max rho — so the result
    is order-independent and reproducible across engines (a float sum
    over buckets would depend on reduction order). ``p >= 8`` keeps
    every scaled term <= 2^52 (exact in the double conversions) and the
    total <= 2^60 (no bigint overflow). Includes the standard
    linear-counting small-range correction.
    """
    regs = hll_registers(df, value_col, p)
    return hll_estimate_from_registers(regs, p)


def hll_estimate_from_registers(regs: DataFrame, p: int) -> DataFrame:
    """Cardinality estimate from an (already merged) register table —
    the read path for persisted / streamed sketches. Register tables
    merge by ``groupBy(bucket).max(max_rho)``, which is idempotent and
    commutative, so unions of per-batch/per-partition sketches estimate
    the union of their inputs."""
    if not 8 <= p <= 18:
        raise ValueError(f"p must be in [8, 18], got {p}")
    m = 1 << p
    w = _HASH_BITS - p
    big_r = w + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)  # m >= 128 constant
    agg = regs.agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {big_r} - max_rho)")).alias("__s"),
        F.count(F.lit(1)).alias("buckets_used"),
    )
    # empty buckets contribute 2^-0 = 1, i.e. 2^R scaled
    z_scaled = F.coalesce(F.col("__s"), F.lit(0)) + (
        (F.lit(m) - F.col("buckets_used")) * F.lit(1 << big_r)
    )
    raw = F.lit(alpha * m * m * float(1 << big_r)) / z_scaled.cast("double")
    zeros = (F.lit(m) - F.col("buckets_used")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 4).alias("estimate"),
        F.col("buckets_used").cast("long").alias("buckets_used"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def cms_registers(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min register table: ``(row int, pos int, cnt bigint)`` with
    one row per non-empty cell (<= depth * width rows total).

    Each input value increments cell ``(i, h_i(v) % width)`` for the
    ``depth`` independent seeded hashes. The groupBy key space is the
    fixed cell grid, so partial counts combine map-side and the shuffle
    is bounded by the sketch size, not the data size.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    v = F.col(value_col)
    positions = F.array(
        *[(_seeded_hash60(v, i) % F.lit(width)).cast("int") for i in range(depth)]
    )
    return (
        df.where(v.isNotNull())
        .select(F.posexplode(positions).alias("row", "pos"))
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_point_estimates(
    registers: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated frequency for each probe value: ``(value_col,
    est_count bigint)`` — the count-min upper bound ``min_i cnt[i,
    h_i(v)]`` (over-counts only, never under-counts).

    ``registers`` is broadcast (it is at most depth*width rows); the
    probe side streams map-side through the hash join, so estimating
    frequencies for a large probe set is shuffle-free up to the final
    per-value min (grouped on the probe key).
    """
    v = F.col(value_col)
    positions = F.array(
        *[(_seeded_hash60(v, i) % F.lit(width)).cast("int") for i in range(depth)]
    )
    exploded = probes.where(v.isNotNull()).select(
        v.alias(value_col), F.posexplode(positions).alias("row", "pos")
    )
    joined = exploded.join(F.broadcast(registers), ["row", "pos"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def _seeded_pos(v: Column, i: int, m_bits: int) -> Column:
    """``_seeded_hash60(v, i) % m_bits`` computed with the cheapest
    exact parse (round 12, guide §1.2): when ``m_bits`` is a power of
    16 (2^20 and 2^24 here), the mod of the 15-hex-char value is just
    the integer value of its LAST ``log16(m)`` hex chars — so ``conv``
    (a string radix parse, the probe scan's hottest op after md5)
    handles 5-6 chars instead of 15. Bit-identical: hex is base 2^4,
    so ``intval(h[1:15]) % 16^j == intval(h[16-j:15])`` exactly."""
    if m_bits > 1 and (m_bits & (m_bits - 1)) == 0 and (
        m_bits.bit_length() - 1
    ) % 4 == 0:
        j = (m_bits.bit_length() - 1) // 4  # m_bits = 16^j
        md5s = F.md5(F.concat(F.lit(f"{i}:"), v.cast("string")))
        return F.conv(F.substring(md5s, 16 - j, j), 16, 10).cast("long")
    return _seeded_hash60(v, i) % F.lit(m_bits)


def _bloom_cells(v: Column, m_bits: int, k: int) -> Column:
    """Array of k (word, bit) cell addresses packed as ``word * 60 +
    bit`` — i.e. the raw bit positions — for value ``v``."""
    return F.array(*[_seeded_pos(v, i, m_bits).cast("int") for i in range(k)])


def bloom_bitset(
    df: DataFrame, value_col: str, m_bits: int = 65536, k: int = 4
) -> DataFrame:
    """Build a Bloom filter over ``value_col`` as a word table
    ``(word int, bits bigint)`` — 60 bits per word (bit 59 max keeps
    every word positive through signed-int64 engines).

    ``groupBy(word).agg(bit_or(...))`` over at most ``ceil(m_bits/60)``
    keys: the OR folds map-side; the shuffle carries the bitset, not
    the data. For a 1 % FPR over 10^9 distinct keys, m_bits ~= 10^10 /
    60 words ~= 1.2 GiB — still a broadcastable side at cluster scale;
    size m_bits to the expected distinct count (m/n ~= 9.6 bits/key at
    k=4 for ~1 % FPR).
    """
    if m_bits < _WORD_BITS or k < 1:
        raise ValueError(f"need m_bits >= {_WORD_BITS} and k >= 1, got {m_bits}, {k}")
    v = F.col(value_col)
    return (
        df.where(v.isNotNull())
        .select(F.explode(_bloom_cells(v, m_bits, k)).alias("bitpos"))
        .select(
            (F.col("bitpos") / _WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), bitpos % {_WORD_BITS})").alias("__m"),
        )
        .groupBy("word")
        .agg(F.bit_or("__m").alias("bits"))
    )


# Above this many bits the driver-side dense-literal compile (collect +
# one expression parse) stops being "a sketch" and starts being a
# driver materialization bottleneck: 2^22 bits = 70 Ki longs ~ 0.5 MiB
# of expression text. Past it, the probe switches to map-side broadcast
# equi-joins against the (word, bits) table, which never touches the
# driver and scales to the multi-GiB bitsets a real 10^8-shingle
# benchmark union needs.
BLOOM_LITERAL_MAX_BITS = 1 << 22


def bloom_contains(
    df: DataFrame,
    value_col: str,
    bitset: DataFrame,
    m_bits: int = 65536,
    k: int = 4,
    keep: str = "hits",
    backend: str = "auto",
) -> DataFrame:
    """Filter ``df`` by Bloom membership of ``value_col``.

    ``keep='hits'`` keeps possible members (contamination candidates —
    includes false positives at the configured rate, never false
    negatives); ``keep='misses'`` keeps definite non-members (safe
    rows). NULL values are kept only under ``keep='misses'`` (a NULL is
    definitely not a member).

    Two physical backends, same result:

    - ``'literal'``: the bitset is materialized on the driver into a
      dense literal array (it is a sketch — contractually tiny, same
      contract as the LSH hyperplane literals in `similarity`), so the
      probe is a PURE MAP-SIDE expression: no join, no shuffle,
      whole-stage codegen over the scan. The shape that lets a 100 TB
      scan test membership at full scan speed — as long as m is small.
    - ``'join'``: k map-side BROADCAST hash joins against the sparse
      ``(word, bits)`` table (`bloom_hit_join`). No driver
      materialization, no expression-parse ceiling: the bitset stays a
      distributed frame until Spark broadcasts it, so m can be the
      10 bits/key a 10^8-shingle benchmark needs. Still zero shuffles
      on the probe side.
    - ``'auto'`` (default): ``'join'`` when ``m_bits >
      BLOOM_LITERAL_MAX_BITS``, else ``'literal'``.
    """
    if keep not in ("hits", "misses"):
        raise ValueError(f"keep must be 'hits' or 'misses', got {keep!r}")
    if backend not in ("auto", "literal", "join"):
        raise ValueError(f"backend must be auto|literal|join, got {backend!r}")
    if backend == "auto":
        backend = "join" if m_bits > BLOOM_LITERAL_MAX_BITS else "literal"
    v = F.col(value_col)
    if backend == "join":
        hit_col = "__bloom_hit"
        probed = bloom_hit_join(df, value_col, bitset, m_bits=m_bits, k=k, hit_col=hit_col)
        if keep == "hits":
            return probed.where(v.isNotNull() & F.col(hit_col)).drop(hit_col)
        return probed.where(v.isNull() | ~F.col(hit_col)).drop(hit_col)
    hit_of = bloom_membership_expr(bitset, m_bits=m_bits, k=k)
    hit = hit_of(v)
    if keep == "hits":
        return df.where(v.isNotNull() & hit)
    return df.where(v.isNull() | ~hit)


def bloom_hit_join(
    df: DataFrame,
    value_col: str,
    bitset: DataFrame,
    m_bits: int = 65536,
    k: int = 4,
    hit_col: str = "__bloom_hit",
) -> DataFrame:
    """Append boolean ``hit_col`` — Bloom membership of ``value_col`` —
    via k map-side broadcast hash joins against the sparse ``(word,
    bits)`` bitset table. The scale-safe backend past the driver-
    literal ceiling (`BLOOM_LITERAL_MAX_BITS`).

    Each hash function i contributes one LEFT broadcast equi-join on
    its word index (the bitset stores only occupied words, so an
    unmatched word is a definite miss); the row is a hit iff all k
    probed bits are set. Broadcast joins stream the probe side — no
    shuffle, no driver collect, and the SAME bitset aggregate sits
    under every broadcast exchange so Spark reuses one build. NULL
    values get ``hit_col = false`` (a NULL is definitely not a member —
    callers that need NULL-keeps-on-misses test ``isNull`` themselves,
    as `bloom_contains` does).
    """
    v = F.col(value_col)
    out = df
    hit_terms = []
    bits_src = bitset.select("word", "bits")
    for i in range(k):
        pos = _seeded_pos(v, i, m_bits).cast("int")
        p, w, b = f"__bp{i}", f"__bw{i}", f"__bb{i}"
        # alias ABOVE the select so the plan under each BroadcastExchange
        # is byte-identical across the k joins — ReuseExchange then
        # builds the hash relation once and shares it
        side = bits_src.alias(f"__bloom{i}")
        out = (
            out.withColumn(p, pos)
            .withColumn(w, (F.col(p) / _WORD_BITS).cast("int"))
            .withColumn(
                f"__bm{i}",
                F.expr(f"shiftleft(cast(1 as bigint), {p} % {_WORD_BITS})"),
            )
            .join(
                F.broadcast(side),
                F.col(w) == F.col(f"__bloom{i}.word"),
                "left",
            )
            .withColumn(b, F.col(f"__bloom{i}.bits"))
            .drop(F.col(f"__bloom{i}.word"))
            .drop(F.col(f"__bloom{i}.bits"))
        )
        hit_terms.append(
            F.coalesce(F.col(b).bitwiseAND(F.col(f"__bm{i}")) != 0, F.lit(False))
        )
    hit = hit_terms[0]
    for t in hit_terms[1:]:
        hit = hit & t
    drop = [c for i in range(k) for c in (f"__bp{i}", f"__bw{i}", f"__bb{i}", f"__bm{i}")]
    return out.withColumn(hit_col, hit).drop(*drop)


def bloom_membership_expr(bitset: DataFrame, m_bits: int = 65536, k: int = 4):
    """Compile a Bloom bitset into a reusable MAP-SIDE membership
    predicate: returns ``hit_of(value: Column) -> Column`` (boolean).

    The bitset is materialized on the driver into ONE parsed dense
    literal (it is a sketch — contractually tiny, the LSH-hyperplane-
    literal contract), so the returned predicate is a pure expression:
    no join, no shuffle, usable inside HOF lambdas (per-shingle probes
    over an array column) and on STREAMING frames (a stream-static
    membership test with zero stream-side state). Building the literal
    element-wise (F.array of n F.lit) costs a py4j round-trip per word
    — ~2 s at 64 Ki bits; one expr string is one parse and constant
    folding makes it a single ArrayData.
    """
    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS
    dense = [0] * n_words
    for r in bitset.select("word", "bits").collect():
        dense[r["word"]] = r["bits"]
    words_lit = F.expr(
        "array(" + ",".join(f"{int(b)}L" for b in dense) + ")"
    )
    masks_lit = F.expr(
        "array(" + ",".join(f"{1 << b}L" for b in range(_WORD_BITS)) + ")"
    )

    def hit_of(v: Column) -> Column:
        # chained ANDs, NOT an array+forall (round 12, guide §1.2): the
        # array constructor computed ALL k seeded md5 probes eagerly,
        # but SQL AND short-circuits in codegen — a non-member misses
        # its first probe with probability (1 - fill_rate), so most
        # misses pay ~1 hash instead of k (measured 19.5 -> see
        # OPTIMIZATION_r12 on the sf1 probe scan). Identical boolean:
        # each term is non-null (positions always index the literal),
        # so lazy AND equals the forall.
        def term(i: int) -> Column:
            pos = _seeded_pos(v, i, m_bits).cast("int")
            return (
                F.element_at(words_lit, (pos / _WORD_BITS).cast("int") + 1)
                .bitwiseAND(F.element_at(masks_lit, (pos % _WORD_BITS) + 1))
                != 0
            )

        hit = term(0)
        for i in range(1, k):
            hit = hit & term(i)
        return hit

    return hit_of


def bloom_fpr(m_bits: int, k: int, n_keys: int) -> float:
    """Analytic false-positive rate ``(1 - e^{-kn/m})^k`` — sizing
    helper for choosing m_bits/k against an expected distinct count."""
    return (1.0 - math.exp(-k * n_keys / float(m_bits))) ** k


def cms_join_size_estimate(
    regs_a: DataFrame, regs_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min register
    tables built with the SAME (depth, width, seeds): the classic
    inner-product estimator ``min_i sum_pos a[i,pos] * b[i,pos]``
    (Cormode & Muthukrishnan 2005). Never under-estimates the true
    ``sum_k cnt_a(k) * cnt_b(k)``; collisions only add.

    This is the optimizer-style pre-check for a 100 TB join: both
    sketches are <= depth*width rows (built in one combinable pass per
    side), so asking "how big would this join be?" costs two tiny
    register scans instead of running the join. Returns one row:
    ``(est_join_rows bigint)``.
    """
    joined = regs_a.alias("a").join(
        regs_b.alias("b"),
        (F.col("a.row") == F.col("b.row")) & (F.col("a.pos") == F.col("b.pos")),
    )
    per_row = joined.groupBy(F.col("a.row").alias("row")).agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip")
    )
    # rows with NO colliding cells at all would drop out of the join;
    # such a row's inner product is 0 and min() must see it
    all_rows = regs_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("row")
    )
    return (
        all_rows.join(per_row, "row", "left")
        .agg(F.min(F.coalesce(F.col("ip"), F.lit(0))).cast("long").alias("est_join_rows"))
    )


def hll_grouped_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 12
) -> DataFrame:
    """Per-group HLL register tables: ``(group_cols..., bucket,
    max_rho)`` — approximate COUNT(DISTINCT value) BY group with
    ``<= 2^p`` ints of state per group instead of a shuffle of every
    (group, value) pair. Same md5 hash as `hll_registers`, so grouped
    and global sketches merge with each other."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not 8 <= p <= 18:
        raise ValueError(f"p must be in [8, 18], got {p}")
    w = _HASH_BITS - p
    h = hash60(F.col(value_col).cast("string"))
    bucket = (h % F.lit(1 << p)).cast("int")
    rest = F.shiftright(h, p)
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.instr(F.lpad(F.bin(rest), w, "0"), "1"))
        .cast("int")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_grouped_cardinality(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 12
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group:
    ``(group_cols..., estimate, buckets_used)``. The estimator is the
    same exact-integer harmonic sum as `hll_cardinality`, evaluated per
    group over the grouped register table."""
    regs = hll_grouped_registers(df, group_cols, value_col, p)
    return _finalize_grouped_hll(regs, group_cols, p)


def _finalize_grouped_hll(
    regs: DataFrame, group_cols: list[str], p: int
) -> DataFrame:
    """Estimate per group from (possibly merged) grouped registers."""
    m = 1 << p
    w = _HASH_BITS - p
    big_r = w + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {big_r} - max_rho)")).alias("__s"),
        F.count(F.lit(1)).alias("buckets_used"),
    )
    z_scaled = F.coalesce(F.col("__s"), F.lit(0)) + (
        (F.lit(m) - F.col("buckets_used")) * F.lit(1 << big_r)
    )
    raw = F.lit(alpha * m * m * float(1 << big_r)) / z_scaled.cast("double")
    zeros = (F.lit(m) - F.col("buckets_used")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("estimate"),
        F.col("buckets_used").cast("long").alias("buckets_used"),
    )


def hll_rolling_cardinality(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_units: int,
    p: int = 12,
) -> DataFrame:
    """Rolling distinct counts by register REUSE: sketch each time
    unit once (`hll_grouped_registers` keyed on ``time_col``), then
    estimate every trailing window of ``window_units`` units by MERGING
    the per-unit registers — never re-scanning the data per window.

    This is the pattern that makes "distinct users per rolling 7 days
    over 100 TB of events" a |days| x 2^p problem instead of a 7x
    re-scan: the expansion join fans each unit's registers into the
    (at most ``window_units``) windows it participates in, and the
    merge is the usual idempotent per-bucket max.

    Returns ``(time_col, estimate, buckets_used)`` — one row per unit
    present in the data, estimating distincts over [unit -
    window_units + 1, unit].
    """
    if window_units < 1:
        raise ValueError("window_units must be >= 1")
    unit_regs = hll_grouped_registers(df, [time_col], value_col, p)
    units = unit_regs.select(F.col(time_col).alias("__w")).distinct()
    # fan registers into the trailing windows they serve — unit u
    # belongs to windows u .. u + window_units - 1 — as a map-side
    # sequence explode + an equi-join against the REAL units (drops
    # phantom windows past the last unit; broadcastable tiny side)
    fanned = unit_regs.select(
        F.explode(
            F.sequence(F.col(time_col), F.col(time_col) + (window_units - 1))
        ).alias("__w"),
        "bucket",
        "max_rho",
    ).join(F.broadcast(units), "__w")
    merged = fanned.groupBy(F.col("__w").alias(time_col), F.col("bucket")).agg(
        F.max("max_rho").alias("max_rho")
    )
    return _finalize_grouped_hll(merged, [time_col], p)


def histogram_registers(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Fixed-bin histogram sketch of ``value_col`` over ``[lo, hi)``:
    ``(bin int, cnt bigint)`` — the mergeable quantile/distribution
    state (merge = sum counts per bin; the associativity the exact
    percentile buffer lacks). Out-of-range values clamp into the edge
    bins, NULLs are excluded. ``bins`` cells of state regardless of
    row count, so partial aggregation does the work map-side and the
    shuffle moves at most ``bins`` rows — the same fixed-address-space
    contract as the HLL/CMS builders above.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    width = (float(hi) - float(lo)) / bins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    regs: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a histogram register table: for each
    ``q``, locate the first bin whose cumulative count reaches
    ``q * total`` and interpolate linearly inside it —
    ``(q double, est double)``, error bounded by one bin width.

    The cumulative walk is a partition-less window ABOVE the
    ``bins``-row aggregate (metadata-sized, the allowed case); the
    quantile targets are a broadcast literal frame.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    width = (float(hi) - float(lo)) / bins
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    walk = regs.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("total"),
    )
    qtab = regs.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(qs)], ["q"]
    )
    hit = (
        walk.join(F.broadcast(qtab), F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy("q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "cum", "total"), F.col("bin")
            ).alias("s")
        )
    )
    frac = (
        F.col("s.cum").cast("double")
        - F.col("s.cnt").cast("double")
    )
    est = (
        F.lit(float(lo))
        + F.lit(width)
        * (
            F.col("s.bin").cast("double")
            + (F.col("q") * F.col("s.total").cast("double") - frac)
            / F.col("s.cnt").cast("double")
        )
    )
    return hit.select(
        "q", F.round(F.least(est, F.lit(float(hi))), 6).alias("est")
    ).orderBy("q")


def hll_pairwise_overlap(
    df: DataFrame, group_col: str, value_col: str, p: int = 12
) -> DataFrame:
    """Approximate distinct-value OVERLAP between every pair of groups
    by HLL inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B),
    where the union estimate comes from a per-bucket register MAX of
    the two groups' sketches — no re-scan, no exact pair shuffle. The
    audience-overlap / shared-users question answered with 2^p ints
    per group.

    Scale shape: registers are computed once per group (map-side
    combinable max); the pair fan-out touches only register rows
    (|groups|²/2 · 2^p at worst — sketch-sized, not data-sized).
    Returns (g_a, g_b, est_a, est_b, est_union, est_overlap), overlap
    clamped at 0 (inclusion–exclusion on estimates can go slightly
    negative for disjoint sets).
    """
    regs = hll_grouped_registers(df, [group_col], value_col, p)
    regs = regs.localCheckpoint(eager=False)
    singles = _finalize_grouped_hll(regs, [group_col], p)
    groups = regs.select(F.col(group_col).alias("__g")).distinct()
    pairs = (
        groups.select(F.col("__g").alias("g_a"))
        .join(groups.select(F.col("__g").alias("g_b")), F.col("g_a") < F.col("g_b"))
    )
    both = pairs.join(
        regs,
        (F.col(group_col) == F.col("g_a")) | (F.col(group_col) == F.col("g_b")),
    )
    union_regs = both.groupBy("g_a", "g_b", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    unions = _finalize_grouped_hll(union_regs, ["g_a", "g_b"], p).select(
        "g_a", "g_b", F.col("estimate").alias("est_union")
    )
    ea = singles.select(
        F.col(group_col).alias("g_a"), F.col("estimate").alias("est_a")
    )
    eb = singles.select(
        F.col(group_col).alias("g_b"), F.col("estimate").alias("est_b")
    )
    return (
        unions.join(ea, "g_a")
        .join(eb, "g_b")
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
                ),
                4,
            ).alias("est_overlap"),
        )
    )
