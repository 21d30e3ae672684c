"""Registry batch 12 — BPE tokenizer training/application and ordered
funnel analysis.

The BPE oracles unroll the merge rounds as chained MATERIALIZED CTEs
(the same unrolled-iteration discipline as the pagerank oracle): each
round's arg-max pair is a scalar subquery with the identical
cnt-desc / pair-asc tie-break the Spark side uses, so the learned merge
table — and the token counts under it — hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import bpe as BPE
from datas_spark.operators import events as EV
from datas_spark.registry_core import register

_BPE_N = 12


def _bpe_chain(n: int, carry_word: bool) -> str:
    """Unrolled BPE rounds as a WITH-clause body: w0 (word-frequency
    table, spaced symbols) then e/p/b/w per round. ``carry_word`` keeps
    the original word through the chain for the application join."""
    wcol = "word, " if carry_word else ""
    parts = [
        rf"""w0 AS MATERIALIZED (
      SELECT {wcol}array_to_string(string_split(word, ''), ' ') AS s, cnt
      FROM (
        SELECT word, count(*)::BIGINT AS cnt FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents
        ) WHERE len(word) > 0 GROUP BY word
      )
    )"""
    ]
    for i in range(1, n + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""e{i} AS (
      SELECT l, cnt, unnest(range(1, len(l))) AS i
      FROM (SELECT string_split(s, ' ') AS l, cnt FROM {prev})
    ), p{i} AS (
      SELECT l[i] || ' ' || l[i+1] AS pair, sum(cnt) AS c FROM e{i} GROUP BY 1
    ), b{i} AS MATERIALIZED (
      SELECT pair, c FROM p{i} WHERE c >= 2 ORDER BY c DESC, pair ASC LIMIT 1
    ), w{i} AS MATERIALIZED (
      SELECT {wcol}CASE WHEN (SELECT count(*) FROM b{i}) = 1
                  THEN replace(s, (SELECT pair FROM b{i}),
                               replace((SELECT pair FROM b{i}), ' ', ''))
                  ELSE s END AS s, cnt
      FROM {prev}
    )"""
        )
    return "WITH " + ",\n    ".join(parts)


_BPE_LEARN_ORACLE = (
    _bpe_chain(_BPE_N, carry_word=False)
    + "\n    SELECT * FROM (\n      "
    + "\n      UNION ALL ".join(
        f"SELECT {i} AS step, pair, replace(pair, ' ', '') AS merged, "
        f"c::BIGINT AS pair_count FROM b{i}"
        for i in range(1, _BPE_N + 1)
    )
    + "\n    )"
)


@register("bpe_learn_merges", oracle=_BPE_LEARN_ORACLE)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a {n}-merge BPE vocabulary on the corpus (SURVEY §2.9):
    the corpus reduces once to its word-frequency table; every round is
    a combinable pair-count aggregate + a one-row arg-max collect + a
    broadcast-literal merge replace. 100 TB story: rounds scale with
    the DISTINCT-WORD table (Heaps' law), not the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    return BPE.learn_bpe_merges(docs, "text", n_merges=_BPE_N)


@register(
    "bpe_token_counts",
    oracle=_bpe_chain(_BPE_N, carry_word=True)
    + f""",
    tok AS (SELECT word, len(string_split(s, ' '))::BIGINT AS n FROM w{_BPE_N}),
    dw AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    ),
    agg AS (
      SELECT doc_id, sum(t.n) AS n_bpe
      FROM dw JOIN tok t USING (word) WHERE len(word) > 0 GROUP BY doc_id
    )
    SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
           coalesce(a.n_bpe, 0)::BIGINT AS n_bpe_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges back to every document and count BPE
    tokens — the compression-ratio check on the trained vocab. The
    merge list collects to the driver (n_merges rows, contractually
    tiny) and applies as a pure map-side literal replace chain; no join
    against the word table on the hot path."""
    docs = read_table(spark, sf_dir, "documents")
    merges = [
        r["pair"]
        for r in BPE.learn_bpe_merges(docs, "text", n_merges=_BPE_N)
        .orderBy("step")
        .collect()
    ]
    return BPE.bpe_token_counts(docs, "doc_id", "text", merges)


# ---------------------------------------------------------------------------
# ordered funnel analysis
# ---------------------------------------------------------------------------

@register(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1)::BIGINT AS n_viewed,
           (SELECT count(*) FROM s2)::BIGINT AS n_clicked,
           (SELECT count(*) FROM s3)::BIGINT AS n_purchased,
           round(100.0 * (SELECT count(*) FROM s2)
                 / greatest((SELECT count(*) FROM s1), 1), 4)
             AS view_to_click_pct,
           round(100.0 * (SELECT count(*) FROM s3)
                 / greatest((SELECT count(*) FROM s2), 1), 4)
             AS click_to_purchase_pct
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase (see
    `operators.events.funnel_counts` for the stage semantics and the
    per-stage pushdown/aggregation scale shape)."""
    ev = read_table(spark, sf_dir, "events")
    out = EV.funnel_counts(ev, ["view", "click", "purchase"])
    return out.select(
        F.col("n_step_0").alias("n_viewed"),
        F.col("n_step_1").alias("n_clicked"),
        F.col("n_step_2").alias("n_purchased"),
        F.col("pct_1").alias("view_to_click_pct"),
        F.col("pct_2").alias("click_to_purchase_pct"),
    )
