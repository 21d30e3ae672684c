"""Registry batch 17 — grouped and rolling-window approximate distinct
counts (HLL register reuse)."""

from __future__ import annotations

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
