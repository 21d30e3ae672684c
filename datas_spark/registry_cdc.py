"""Query registry — lakehouse CDC domain (round 6): SCD Type-2
dimension history built from a change log, incrementally MERGEd, and
probed point-in-time.

The change log is derived deterministically from ``orders``: each
order is a "change" to its customer's (priority, status) dimension at
``o_orderdate`` (``o_orderkey`` as the per-key unique sequence).
~1.5k keys × ~10 changes each at sf0.01 — the shape of a real
source-catalog dimension, small relative to facts but queried by every
point-in-time join.

Imported by datas_spark.registry for its side effects (registrations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import cdc as CDC
from datas_spark.registry_core import ORACLES, register

_KEYS = ["custkey"]
_ATTRS = ["priority", "status"]

# DuckDB twin of the changelog derivation + scd2_from_changelog:
# run-collapse via null-safe lag comparison, then lead() for valid_to.
_SCD2_CORE = """
    log AS (
      SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS seq,
             o_orderpriority AS priority, o_orderstatus AS status
      FROM orders
    ), flagged AS (
      SELECT custkey, ts, seq, priority, status,
             (lag(seq) OVER w IS NULL) AS first_row,
             (priority IS DISTINCT FROM lag(priority) OVER w
              OR status IS DISTINCT FROM lag(status) OVER w) AS chg
      FROM log WINDOW w AS (PARTITION BY custkey ORDER BY ts, seq)
    ), kept AS (
      SELECT custkey, ts, seq, priority, status
      FROM flagged WHERE first_row OR chg
    ), scd AS (
      SELECT custkey, priority, status, ts AS valid_from,
             lead(ts) OVER w2 AS valid_to, seq::BIGINT AS change_seq,
             (lead(ts) OVER w2 IS NULL)::INT AS is_current
      FROM kept WINDOW w2 AS (PARTITION BY custkey ORDER BY ts, seq)
    )
"""

_SCD2_SELECT = """
    SELECT custkey, priority, status, valid_from, valid_to, change_seq,
           is_current
    FROM scd
"""


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )


def _present(scd: DataFrame) -> DataFrame:
    return scd.select(
        "custkey", "priority", "status", "valid_from", "valid_to",
        "change_seq", F.col("is_current").cast("int").alias("is_current"),
    )


@register("scd2_build", oracle=f"WITH {_SCD2_CORE} {_SCD2_SELECT}")
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history from the full change log: run-collapse on
    null-safe attribute equality, then interval assembly — two windows,
    both partitioned by the dimension key (bounded per-key history,
    never a global sort). Extends the reference (flat snapshots only)
    with the lakehouse dimension-history surface."""
    scd = CDC.scd2_from_changelog(
        _changelog(spark, sf_dir), _KEYS, _ATTRS, "ts", "seq"
    )
    return _present(scd)


@register("scd2_incremental_merge", oracle=f"WITH {_SCD2_CORE} {_SCD2_SELECT}")
def q_scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a late batch into existing SCD2 history and land on the
    exact full-rebuild result (the oracle IS the full rebuild): history
    is built from pre-1997 changes, the 1997+ tail arrives as the delta
    batch, and only touched keys are replayed (semi-join + per-key
    window) — untouched keys pass through without a shuffle of their
    rows. The daily-ingest contract at 100 TB: cost ∝ |touched keys|,
    not |history|."""
    log = _changelog(spark, sf_dir)
    cutoff = F.lit("1997-01-01").cast("timestamp")
    history = CDC.scd2_from_changelog(
        log.where(F.col("ts") < cutoff), _KEYS, _ATTRS, "ts", "seq"
    )
    merged = CDC.merge_scd2(
        history, log.where(F.col("ts") >= cutoff), _KEYS, _ATTRS, "ts", "seq"
    )
    return _present(merged)


@register("scd2_repair_keys", oracle=f"WITH {_SCD2_CORE} {_SCD2_SELECT}")
def q_scd2_repair_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data repair landing on the EXACT full rebuild (the oracle
    IS the full rebuild — VERDICT r7 #8): history is built from the
    changelog with every 17th change missing (stragglers scattered
    through time, genuinely out-of-order), the stragglers then arrive
    as a late batch, and `cdc.scd2_repair_keys` re-derives ONLY the
    touched keys' runs from their changelog slice ∪ the late rows.
    merge_scd2 can only give late data run-view semantics (compaction
    discarded in-run repeats); repair from the retained log is exact —
    the hash match against the full-rebuild oracle proves it every
    driver run, at cost ∝ |touched keys|."""
    log = _changelog(spark, sf_dir)
    straggler = F.col("seq") % 17 == 0
    history = CDC.scd2_from_changelog(
        log.where(~straggler), _KEYS, _ATTRS, "ts", "seq"
    )
    repaired = CDC.scd2_repair_keys(
        history, log.where(~straggler), log.where(straggler),
        _KEYS, _ATTRS, "ts", "seq",
    )
    return _present(repaired)


@register(
    "scd2_point_in_time",
    oracle=f"""
    WITH {_SCD2_CORE}
    SELECT custkey, priority, status, valid_from, change_seq
    FROM scd
    WHERE valid_from <= TIMESTAMP '1995-06-30'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '1995-06-30')
    """,
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot: each key's dimension row as it was on
    1995-06-30 — a pure interval filter over the SCD2 frame (pushes to
    the scan once the history is materialized; no shuffle, no replay).
    This is the read pattern that makes SCD2 pay for itself: training
    joins fetch the value that was true at example time, preventing
    label leakage."""
    scd = CDC.scd2_from_changelog(
        _changelog(spark, sf_dir), _KEYS, _ATTRS, "ts", "seq"
    )
    snap = CDC.scd2_as_of(scd, F.lit("1995-06-30").cast("timestamp"))
    return snap.select("custkey", "priority", "status", "valid_from", "change_seq")


@register(
    "scd2_pit_enrich",
    oracle=f"""
    WITH {_SCD2_CORE},
    probe AS (
      SELECT o_orderkey, o_custkey AS custkey,
             o_orderdate - INTERVAL 30 DAY AS asof_ts
      FROM orders
    )
    SELECT p.o_orderkey, p.custkey, p.asof_ts,
           s.priority AS prio_asof, s.status AS status_asof
    FROM probe p
    LEFT JOIN scd s
      ON p.custkey = s.custkey
     AND s.valid_from <= p.asof_ts
     AND (s.valid_to IS NULL OR s.valid_to > p.asof_ts)
    """,
)
def q_scd2_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time FEATURE join — the feature-store read pattern that
    prevents label leakage: every order fetches its customer's
    dimension values as they were 30 days BEFORE the order (probing at
    event time would be leakage-adjacent; probing before it is the
    honest training feature). Plan shape: equi-join on the dimension
    key with the interval containment as a residual join filter —
    disjoint intervals guarantee ≤ 1 match, and orders before a key's
    first run keep NULL features via the left join. At 100 TB the
    dimension side is the small one: broadcast it."""
    scd = CDC.scd2_from_changelog(
        _changelog(spark, sf_dir), _KEYS, _ATTRS, "ts", "seq"
    )
    dim = scd.select(
        F.col("custkey").alias("__ck"),
        F.col("priority").alias("prio_asof"),
        F.col("status").alias("status_asof"),
        "valid_from",
        "valid_to",
    )
    probe = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.expr("o_orderdate - INTERVAL 30 DAYS").alias("asof_ts"),
    )
    j = probe.join(
        dim,
        (F.col("custkey") == F.col("__ck"))
        & (F.col("valid_from") <= F.col("asof_ts"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("asof_ts"))),
        "left",
    )
    return j.select("o_orderkey", "custkey", "asof_ts", "prio_asof", "status_asof")


@register(
    "ivm_join_delta",
    oracle="""
    WITH a_old AS (
      SELECT o_orderkey AS okey, o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-06-01'
    ), a_new AS (
      SELECT o_orderkey AS okey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-06-01'
    ), b_old AS (
      SELECT l_orderkey AS okey, l_linenumber, l_extendedprice FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1997-06-01'
    ), b_new AS (
      SELECT l_orderkey AS okey, l_linenumber, l_extendedprice FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    )
    SELECT okey, o_custkey, l_linenumber, l_extendedprice
    FROM a_new JOIN b_old USING (okey)
    UNION ALL
    SELECT okey, o_custkey, l_linenumber, l_extendedprice
    FROM a_old JOIN b_new USING (okey)
    UNION ALL
    SELECT okey, o_custkey, l_linenumber, l_extendedprice
    FROM a_new JOIN b_new USING (okey)
    """,
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for the orders ⋈ lineitem view
    (`incremental.ivm_join_delta`): the rows a day's append-deltas add
    to the stored join — ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, never |history|².
    Each term joins at least one small (delta) side, so the planner
    broadcasts it and touches only matching history keys; appending
    the result to the view is proven equal to a full recompute in
    tests/test_incremental.py."""
    from datas_spark.operators.incremental import ivm_join_delta

    cutoff = F.lit("1997-06-01").cast("timestamp")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_custkey", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        "l_linenumber",
        "l_extendedprice",
        "l_shipdate",
    )
    a_old = orders.where(F.col("o_orderdate") < cutoff).drop("o_orderdate")
    a_new = orders.where(F.col("o_orderdate") >= cutoff).drop("o_orderdate")
    b_old = li.where(F.col("l_shipdate") < cutoff).drop("l_shipdate")
    b_new = li.where(F.col("l_shipdate") >= cutoff).drop("l_shipdate")
    return ivm_join_delta(a_old, a_new, b_old, b_new, ["okey"]).select(
        "okey", "o_custkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "scd2_from_snapshots",
    oracle="""
    WITH snaps AS (
      SELECT custkey, yr, priority FROM (
        SELECT o_custkey AS custkey, year(o_orderdate)::BIGINT AS yr,
               o_orderpriority AS priority,
               row_number() OVER (PARTITION BY o_custkey, year(o_orderdate)
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                 AS rn
        FROM orders
      ) WHERE rn = 1
    ), keys AS (SELECT DISTINCT custkey FROM snaps),
    sl AS (SELECT DISTINCT yr FROM snaps),
    grid AS (SELECT custkey, yr FROM keys CROSS JOIN sl),
    obs AS (
      SELECT g.custkey, g.yr, s.priority,
             (s.custkey IS NOT NULL) AS present
      FROM grid g LEFT JOIN snaps s USING (custkey, yr)
    ), flagged AS (
      SELECT custkey, yr, priority, present,
             (lag(yr) OVER w IS NULL) AS first_row,
             (present IS DISTINCT FROM lag(present) OVER w
              OR priority IS DISTINCT FROM lag(priority) OVER w) AS chg
      FROM obs WINDOW w AS (PARTITION BY custkey ORDER BY yr)
    ), kept AS (
      SELECT custkey, yr, priority, present FROM flagged
      WHERE (first_row OR chg) AND (present OR NOT first_row)
    ), runs AS (
      SELECT custkey, priority, present, yr AS valid_from,
             lead(yr) OVER (PARTITION BY custkey ORDER BY yr) AS valid_to
      FROM kept
    )
    SELECT custkey, priority, valid_from, valid_to,
           (valid_to IS NULL)::INT AS is_current
    FROM runs WHERE present
    """,
)
def q_scd2_from_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from periodic snapshots (`cdc.scd2_from_snapshots`) — the
    no-changelog real world: yearly dimension exports derived from
    orders (a customer is IN year Y's snapshot iff they ordered that
    year; attr = the year's last order priority), folded into history
    where ABSENCE IS A CHANGE: a customer skipping a year gets their
    run closed (delete) and a fresh run on return — no interval spans
    the gap. The presence grid crosses the key frame with the TINY
    broadcast snapshot list; everything else is the key-partitioned
    window algebra of the changelog path."""
    orders = read_table(spark, sf_dir, "orders")
    snaps = (
        orders.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.max_by(
                F.col("o_orderpriority"),
                F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
            ).alias("priority")
        )
    )
    scd = CDC.scd2_from_snapshots(snaps, ["custkey"], ["priority"], "yr")
    return scd.select(
        "custkey", "priority", "valid_from", "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
    )


_SNAPSHOT_FOLD_ORACLE = ORACLES["scd2_from_snapshots"]


def _yearly_snaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").cast("long").alias("yr"),
    ).agg(
        F.max_by(
            F.col("o_orderpriority"),
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
        ).alias("priority")
    )


@register("scd2_snapshot_merge", oracle=_SNAPSHOT_FOLD_ORACLE)
def q_scd2_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly snapshot MERGE (`cdc.merge_snapshot_scd2`): history is
    the full fold of the 1995-1999 yearly exports; the 2000 and 2001
    exports then merge in one at a time — each a full-outer join of
    CURRENT runs vs the snapshot keys deciding close / keep / flip /
    open, with closed history passing through untouched. The oracle is
    the full fold over all years, so hash-green proves sequential
    merges == rebuild (the incremental-ingest contract: nightly cost is
    |current| + |snapshot|, never the closed history)."""
    from datas_spark.operators.cdc import merge_snapshot_scd2

    snaps = _yearly_snaps(spark, sf_dir)
    hist = CDC.scd2_from_snapshots(
        snaps.where(F.col("yr") <= 1999), ["custkey"], ["priority"], "yr"
    ).select("custkey", "priority", "valid_from", "valid_to", "is_current")
    for y in (2000, 2001):
        hist = merge_snapshot_scd2(
            hist,
            snaps.where(F.col("yr") == y).select("custkey", "priority"),
            ["custkey"],
            ["priority"],
            F.lit(y).cast("long"),
        )
    return hist.select(
        "custkey", "priority", "valid_from", "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
    )
