"""Registry batch 23 — robust anomaly detection and recipe-weighted
mixture sampling: median/MAD outlier flagging over event values, and a
token-budget mixture that fills per-source budgets in deterministic
hash order (the data-mixing step of a pretraining corpus recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.registry_core import register

_MAD_K = 3.0  # flag |v - median| > 3 * MAD

# per-source char budgets (n_chars is the documented token proxy — the
# testdata has no tokenizer column; the operator is weight-agnostic)
_MIX_BUDGETS = {"src0": 4000, "src1": 3000, "src2": 2000, "src3": 1000}
_MIX_SQL = ", ".join(f"('{k}', {v})" for k, v in sorted(_MIX_BUDGETS.items()))


@register(
    "events_value_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - s.med), 0.5), 6) AS mad
      FROM events e JOIN stats s USING (event_type)
      GROUP BY e.event_type, s.med
    )
    SELECT e.event_id, e.event_type, e.value, s.med, m.mad
    FROM events e
    JOIN stats s USING (event_type) JOIN mad m USING (event_type)
    WHERE abs(e.value - s.med) > {_MAD_K} * m.mad
    ORDER BY e.event_type, e.event_id
    """,
)
def q_events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier events: |value − median| > 3·MAD (median
    absolute deviation) — the robust twin of z-scoring, immune to the
    outliers it hunts (mean/stddev get dragged by the tail; the two
    medians don't).

    Both statistics are exact interpolated percentiles rounded to 6 dp
    BEFORE the comparison, so the flag decision is identical on both
    engines; they live in a ≤|types|-row broadcast frame, and the flag
    itself is a map-side comparison — one grouped pass per statistic,
    no window over raw rows."""
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
            ).alias("mad")
        )
        .drop("med")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .join(F.broadcast(mad), "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
        .orderBy("event_type", "event_id")
    )


@register(
    "token_budget_mixture",
    oracle=f"""
    WITH budgets (source, budget) AS (VALUES {_MIX_SQL}),
    ranked AS (
      SELECT d.doc_id, d.source, d.n_chars, b.budget,
             sum(d.n_chars) OVER (
               PARTITION BY d.source
               ORDER BY (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                         / 4294967296.0) ASC, d.doc_id ASC
               ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      FROM documents d JOIN budgets b USING (source)
    )
    SELECT doc_id, source, n_chars FROM ranked
    WHERE cum - n_chars < budget
    ORDER BY source, doc_id
    """,
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recipe-weighted corpus mixing: fill each source's token budget
    (n_chars as the proxy weight) with documents in deterministic
    md5-draw order — "40% src0, 30% src1, ..." expressed in TOKENS,
    the unit pretraining recipes are written in, not documents
    (see ``corpus.token_budget_mixture``). A document is admitted iff
    its source's budget was not exhausted before it, so the selection
    is a reproducible greedy prefix; sources outside the recipe are
    excluded."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = C.token_budget_mixture(
        docs, "source", "n_chars", _MIX_BUDGETS, id_col="doc_id"
    )
    return out.select("doc_id", "source", "n_chars").orderBy("source", "doc_id")
