"""Registry batch 58 — sketch set algebra (HLL pairwise overlap),
PSI feature-drift monitoring, and multi-touch linear attribution.
"""

from __future__ import annotations

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
