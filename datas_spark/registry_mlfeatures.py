"""ML feature engineering: training-set constructors, DSIR weights, encodings, leakage-safe featurizer, salted joins.

Consolidated from the former numeric registry batches 22, 35, 38, 55, 68 (round-5 cleanup; query
names unchanged). Each section below keeps its original batch
docstring for provenance."""
from __future__ import annotations

# ==================================================================
# former registry22.py
# ==================================================================

"""Registry batch 22 — training-set construction primitives:
contrastive hard-negative mining, exact deterministic label
rebalancing, and per-source score calibration by rank normalization.

Determinism discipline: hard negatives rank a 6-dp-rounded cosine with
id tie-breaks; rebalancing replicates by exact integer factors with the
md5-uniform election; calibration is percent_rank over a 6-dp-rounded
score — every cross-engine comparison happens on exact values.
"""


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datas_spark.functions import text as T
from datas_spark.io.sources import read_table
from datas_spark.operators import corpus as C
from datas_spark.operators import similarity as SIM
from datas_spark.registry_core import register

_HN_QUERIES = 3  # vec_id < 3 are the anchor set
_HN_K = 5

# md5-uniform (same expression family as registry_curation's _MD5_UNIT_SQL)
_MD5_SQL = "(('0x' || substr(md5({key}), 1, 8))::BIGINT / 4294967296.0)"


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding AS qv, label AS ql
      FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ), scored AS (
      SELECT q.q_vec_id, d.vec_id AS d_vec_id,
        round(
          list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
          / (sqrt(list_sum(list_transform(range(1, len(d.embedding) + 1),
                   i -> d.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))), 6) AS cos
      FROM embeddings d CROSS JOIN q
      WHERE d.label != q.ql
    )
    SELECT q_vec_id, d_vec_id, cos, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cos DESC, d_vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_HN_K}
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives: for each anchor embedding, the top-5
    most similar vectors with a DIFFERENT label — the highest-loss
    negatives for contrastive/embedding training (the easy negatives a
    random sampler drew teach nothing).

    Same scale-safe plan as ``cosine_topk`` (broadcast anchor set,
    map-side cosine, two-stage bucketed rank — no per-query hot
    reducer); the label-mismatch restriction filters candidate pairs
    before anything ranks."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(
        emb,
        emb.where(F.col("vec_id") < _HN_QUERIES),
        "vec_id",
        "vec_id",
        "embedding",
        k=_HN_K,
        exclude_match_col="label",
    )


@register(
    "label_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT label AS lbl, count(*)::BIGINT AS c FROM embeddings GROUP BY label
    ), tgt AS (
      SELECT max(c)::BIGINT AS t FROM counts
    ), ranked AS (
      SELECT e.vec_id, e.label, c.c, g.t,
             row_number() OVER (PARTITION BY e.label
                                ORDER BY {_MD5_SQL.format(key="e.vec_id::VARCHAR")} ASC,
                                         e.vec_id ASC) AS rk
      FROM embeddings e JOIN counts c ON c.lbl = e.label CROSS JOIN tgt g
    )
    SELECT vec_id, label,
           unnest(range(1, (t // c) + (CASE WHEN rk <= t % c THEN 1 ELSE 0 END) + 1))
             AS copy_idx
    FROM ranked
    """,
)
def q_label_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact class rebalancing of the embedding labels to the majority
    class count: minority rows replicate ``t div c`` times, with the
    ``t mod c`` smallest-md5-draw rows of each class carrying one extra
    copy — every class ends at exactly ``t`` rows, bit-reproducibly on
    any cluster layout (see ``corpus.rebalance_labels``)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return C.rebalance_labels(emb, "vec_id", "label")


@register(
    "source_calibrated_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, text,
        string_split_regex(trim(text), '\s+') AS toks,
        length(text) AS n,
        length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
      FROM documents
    ), terms AS (
      SELECT doc_id, source,
        least(n / 500.0, 1.0) AS len_term,
        least((CASE WHEN len(toks) > 0
               THEN len(list_filter(toks, t -> lower(t) IN
                    ('the','and','of','to','a','in','is','it')))::DOUBLE / len(toks)
               ELSE 0.0 END) * 4.0, 1.0) AS stop_term,
        1.0 - least((CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END) * 5.0, 1.0)
          AS punct_term
      FROM t
    ), scored AS (
      SELECT doc_id, source,
             round((len_term + stop_term + punct_term) / 3.0, 6) AS quality
      FROM terms
    )
    SELECT doc_id, source, quality,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality ASC), 6) AS calibrated
    FROM scored
    """,
)
def q_source_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source score calibration: the heuristic quality score is
    rank-normalized WITHIN each source (percent_rank → [0, 1]), so a
    quality cutoff means "keep the best X% of every source" rather
    than letting one source's score scale dominate the mix — the
    standard correction when combining corpora whose raw scores are
    not comparable.

    Ties share a percent_rank in both engines (rank semantics), the
    score is rounded before ranking, and the window is PARTITIONED BY
    source — per-source local sorts, no global ordering."""
    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", T.quality_score("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.asc("quality"))
    return scored.select(
        "doc_id",
        "source",
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("calibrated"),
    )

# ==================================================================
# former registry35.py
# ==================================================================

"""Registry batch 35 — the generic salted equi-join, proven by an
IDENTITY oracle: the salted plan must produce byte-for-byte the same
rows as the plain join it replaces (salting buys distribution, never
semantics). The registered query enriches every event with its user's
lifetime stats — the classic hot-user fact-to-dim join that stragglers
kill at scale.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.joins import salted_equi_join
from datas_spark.registry_core import register


@register(
    "events_salted_enrich",
    oracle="""
    WITH stats AS (
      SELECT user_id, count(*)::BIGINT AS user_events,
             min(ts) AS first_seen
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id, e.event_type, s.user_events, s.first_seen
    FROM events e JOIN stats s USING (user_id)
    """,
)
def q_events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim enrichment through `salted_equi_join`: every event
    picks up its user's lifetime event count and first-seen time. The
    oracle is the PLAIN join — the identity contract is the whole
    point (same output, skew-proof distribution: a user holding 30% of
    events probes across 8 tasks instead of one).

    The dim side here derives from the fact table (a per-user
    aggregate), so the query also exercises the common self-enrichment
    topology where the dim is too big to broadcast at 10⁹ users."""
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("user_events"),
        F.min("ts").alias("first_seen"),
    )
    left = ev.select("event_id", "user_id", "event_type")
    return salted_equi_join(left, stats, "user_id", salt_buckets=8)

# ==================================================================
# former registry38.py
# ==================================================================

"""Registry batch 38 — DSIR importance weighting: the
importance-resampling data-selection signal (Xie et al. 2023) that
tilts a raw crawl toward a trusted target slice. A flagship curation
operator alongside the quality/LM/contamination family.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.corpus import dsir_importance
from datas_spark.registry_core import register


@register(
    "dsir_importance_weights",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, (source IN ('src0', 'src1')) AS tgt,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), ct AS (
      SELECT t, count(*)::BIGINT AS ct FROM toks WHERE tgt GROUP BY 1
    ), cr AS (
      SELECT t, count(*)::BIGINT AS cr FROM toks GROUP BY 1
    ), vocab AS (
      SELECT cr.t, coalesce(ct.ct, 0)::BIGINT AS ct, cr.cr
      FROM cr LEFT JOIN ct USING (t)
    ), scal AS (
      SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr,
             count(*)::BIGINT AS v
      FROM vocab
    ), ratio AS (
      SELECT v.t,
             ln((v.ct + 1)::DOUBLE / (s.nt + s.v)::DOUBLE)
           - ln((v.cr + 1)::DOUBLE / (s.nr + s.v)::DOUBLE) AS lr
      FROM vocab v CROSS JOIN scal s
    ), scored AS (
      SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
             round(sum(r.lr), 6) AS dsir_weight
      FROM toks tk JOIN ratio r USING (t) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           s.dsir_weight
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against a trusted target slice (sources
    src0/src1 stand in for the curated domain): every document scores
    Σ log(p_target/p_raw) over its unigrams with add-one smoothing —
    positive = more target-like than the corpus average. Sampling
    ∝ exp(weight) is the importance-resampling recipe for domain
    tilting at crawl scale.

    One tokenize pass feeds the hashed count frames AND the scoring
    explode; both smoothing scalars broadcast from a 1-row aggregate;
    the token-key join is the only real shuffle. The DuckDB twin
    retrains on string tokens — identical counts, identical weights."""
    docs = read_table(spark, sf_dir, "documents")
    return dsir_importance(
        docs, "doc_id", "text", F.col("source").isin("src0", "src1")
    )

# ==================================================================
# former registry55.py
# ==================================================================

"""Registry batch 55 — training-example constructors: sliding-window
next-event datasets and deterministic hash-drawn negative sampling
(`operators/training.py`).
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import training as TRN
from datas_spark.registry_core import register

_SEQ_LEN = 5
_NEG_K = 3
_NEG_OVER = 4


@register(
    "next_event_examples",
    oracle=f"""
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_SEQ_LEN} PRECEDING AND 1 PRECEDING) AS hist
      FROM events
    )
    SELECT event_id, user_id,
           array_to_string(hist, ',') AS history,
           event_type AS label
    FROM seq WHERE len(hist) >= 1 AND event_id % 7 = 0
    """,
)
def q_next_event_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user's previous {_SEQ_LEN} event types → next event type)
    training rows — the session-based next-action dataset. One
    user-keyed window with a row-bounded frame; the mod-7 slice bounds
    driver-compared output (the window still runs over all rows)."""
    ev = read_table(spark, sf_dir, "events")
    ex = TRN.next_event_examples(
        ev, "user_id", "ts", "event_type", seq_len=_SEQ_LEN, tiebreak_col="event_id"
    )
    return ex.where(F.col("event_id") % 7 == 0).select(
        "event_id",
        "user_id",
        F.concat_ws(",", "history").alias("history"),
        "label",
    )


@register(
    "negative_sample_views",
    oracle=f"""
    WITH pos AS (
      SELECT DISTINCT user_id AS u, json_extract(props, '$.k')::INT AS i
      FROM events WHERE event_type = 'view'
    ), items AS (
      SELECT i, row_number() OVER (ORDER BY i) - 1 AS idx
      FROM (SELECT DISTINCT i FROM pos)
    ), n AS (
      SELECT count(*)::BIGINT AS n_items FROM items
    ), cand AS (
      SELECT u, c,
             ('0x' || substr(md5(u::VARCHAR || ':' || c::VARCHAR), 1, 15))::BIGINT
               % n_items AS idx
      FROM (SELECT DISTINCT u FROM pos)
      CROSS JOIN range({_NEG_K * _NEG_OVER}) t(c)
      CROSS JOIN n
    ), drawn AS (
      SELECT u, i, min(c) AS c
      FROM cand JOIN items USING (idx) GROUP BY 1, 2
    ), neg AS (
      SELECT d.* FROM drawn d ANTI JOIN pos p ON d.u = p.u AND d.i = p.i
    )
    SELECT u AS user_id, i AS item, c AS slot FROM (
      SELECT *, row_number() OVER (PARTITION BY u ORDER BY c) AS r FROM neg
    ) WHERE r <= {_NEG_K}
    """,
)
def q_negative_sample_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up to {_NEG_K} hash-drawn negative items per user over the view
    interactions — implicit-feedback negatives, bit-reproducible (the
    md5 draw protocol is replayed verbatim in the oracle)."""
    ev = read_table(spark, sf_dir, "events")
    inter = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    return TRN.negative_sample(
        inter, "user_id", "item", k=_NEG_K, oversample=_NEG_OVER
    ).select("user_id", "item", "slot")

# ==================================================================
# former registry68.py
# ==================================================================

"""Registry batch 68 — leakage-safe lag/rolling featurizer
(`timeseries.lag_features`) over the per-user daily series.
"""


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.timeseries import lag_features
from datas_spark.registry_core import register


@register(
    "user_daily_lag_features",
    oracle="""
    WITH daily AS (
      SELECT user_id, ts::DATE AS day,
             sum(round(value * 100)::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day::VARCHAR AS day, cents,
           lag(cents, 1) OVER w AS lag_1,
           lag(cents, 7) OVER w AS lag_7,
           sum(cents) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             AS roll7_sum,
           round(avg(cents) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6)
             AS roll7_mean
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    QUALIFY user_id % 29 = 0
    """,
)
def q_user_daily_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily feature rows: previous-day and previous-week
    lags plus the trailing-7-row sum/mean EXCLUDING the current day —
    the leakage-safe featurizer convention (step t sees strictly-prior
    steps only). All feature columns share one (user, day) exchange +
    sort; exact integer-cents series. The mod-29 user slice bounds
    driver output after the windows run on everyone."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    out = lag_features(
        daily, "user_id", "day", "cents", lags=[1, 7], rolling_windows=[7]
    )
    return out.where(F.col("user_id") % 29 == 0).select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        "cents",
        "lag_1",
        "lag_7",
        "roll7_sum",
        F.round("roll7_mean", 6).alias("roll7_mean"),
    )


# ==================================================================
# round 5: UniMax budget allocation
# ==================================================================

_UNIMAX_BUDGET = 300_000
_UNIMAX_EPOCHS = 1.5


_DCR_BE, _DCR_ME, _DCR_RSTAR = 4.0, 8.0, 15.39


@register(
    "data_constrained_mix",
    oracle=f"""
    WITH per AS (
      SELECT source, sum(n_chars)::BIGINT AS avail_tokens
      FROM documents GROUP BY 1
    ), tot AS (SELECT sum(avail_tokens)::BIGINT AS t FROM per),
    c AS (
      SELECT source, avail_tokens,
             floor(avail_tokens * {_DCR_ME})::BIGINT AS cap_tokens,
             floor(t * {_DCR_BE})::BIGINT AS budget
      FROM per CROSS JOIN tot
    ), o AS (
      SELECT *,
             row_number() OVER (ORDER BY cap_tokens ASC, source ASC) - 1 AS i,
             count(*) OVER () AS n,
             coalesce(sum(cap_tokens) OVER (
               ORDER BY cap_tokens ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM c
    ), s AS (
      SELECT *, cap_tokens * (n - i) <= budget - cum_before AS small
      FROM o
    ), a AS (
      SELECT coalesce(sum(CASE WHEN small THEN cap_tokens END), 0)::BIGINT
               AS small_sum,
             count(*) FILTER (NOT small)::BIGINT AS n_large
      FROM s
    ), al AS (
      SELECT source, avail_tokens,
             CASE WHEN small THEN cap_tokens
                  ELSE least(cap_tokens,
                             greatest(floor((budget - small_sum)
                                            / greatest(n_large, 1))::BIGINT, 0))
             END AS alloc_tokens
      FROM s CROSS JOIN a
    ), rep AS (
      SELECT source, avail_tokens, alloc_tokens,
             round(alloc_tokens / (CASE WHEN avail_tokens > 0
                                        THEN avail_tokens END), 6) AS epochs,
             round(CASE WHEN avail_tokens > 0 THEN greatest(
                     alloc_tokens::DOUBLE / avail_tokens - 1.0, 0.0)
                   ELSE 0.0 END, 6) + 0.0 AS repetitions,
             least(alloc_tokens, avail_tokens)::DOUBLE AS u
      FROM al
    )
    SELECT source, avail_tokens, alloc_tokens, epochs, repetitions,
           round(u * (1.0 + {_DCR_RSTAR}
                      * (1.0 - exp(-repetitions / {_DCR_RSTAR}))), 6) + 0.0
             AS effective_tokens,
           CASE WHEN alloc_tokens > 0 THEN
             round((round(u * (1.0 + {_DCR_RSTAR}
                      * (1.0 - exp(-repetitions / {_DCR_RSTAR}))), 6) + 0.0)
                   / alloc_tokens::DOUBLE, 6) END + 0.0 AS efficiency
    FROM rep
    """,
)
def q_data_constrained_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained scaling readout (Muennighoff 2023,
    `corpus.data_constrained_report`): a 4-epoch training budget
    water-fills over sources (UniMax, 8-epoch cap), and each source's
    repeated tokens are priced by the paper's decaying-value law
    (R* = 15.39) — effective tokens and budget efficiency per source,
    with the budget derived from the corpus total INSIDE the plan (the
    same query scales across sf without retuning). The oracle replays
    the lazy budget, the water-filling, and the decay math."""
    from datas_spark.operators.corpus import data_constrained_report

    docs = read_table(spark, sf_dir, "documents")
    return data_constrained_report(
        docs, "source", "n_chars",
        budget_epochs=_DCR_BE, max_epochs=_DCR_ME, r_star=_DCR_RSTAR,
    )


@register(
    "unimax_source_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source, sum(n_chars)::BIGINT AS avail_tokens
      FROM documents GROUP BY 1
    ), c AS (
      SELECT source, avail_tokens,
             floor(avail_tokens * {_UNIMAX_EPOCHS})::BIGINT AS cap_tokens
      FROM per
    ), o AS (
      SELECT *,
             row_number() OVER (ORDER BY cap_tokens ASC, source ASC) - 1 AS i,
             count(*) OVER () AS n,
             coalesce(sum(cap_tokens) OVER (
               ORDER BY cap_tokens ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM c
    ), s AS (
      SELECT *,
             cap_tokens * (n - i) <= {_UNIMAX_BUDGET} - cum_before AS small
      FROM o
    ), a AS (
      SELECT coalesce(sum(CASE WHEN small THEN cap_tokens END), 0)::BIGINT
               AS small_sum,
             count(*) FILTER (NOT small)::BIGINT AS n_large
      FROM s
    )
    SELECT source, avail_tokens, cap_tokens,
           CASE WHEN small THEN cap_tokens
                ELSE least(cap_tokens,
                           greatest(floor(({_UNIMAX_BUDGET} - small_sum)
                                          / greatest(n_large, 1))::BIGINT, 0))
           END AS alloc_tokens,
           round((CASE WHEN small THEN cap_tokens
                ELSE least(cap_tokens,
                           greatest(floor(({_UNIMAX_BUDGET} - small_sum)
                                          / greatest(n_large, 1))::BIGINT, 0))
           END) / (CASE WHEN avail_tokens > 0 THEN avail_tokens END), 6)
             AS epochs
    FROM s CROSS JOIN a
    """,
)
def q_unimax_source_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. 2023) per-source budget allocation over
    document char mass: small sources contribute everything up to the
    {_UNIMAX_EPOCHS}-epoch cap, the remaining budget water-fills
    uniformly over the large sources — computed in closed form with
    windows over the per-source aggregate only (sources are
    broadcast-tiny at any corpus size). Feeds token_budget_mixture as
    its per-source budget table."""
    from datas_spark.operators.corpus import unimax_allocation

    docs = read_table(spark, sf_dir, "documents")
    return unimax_allocation(
        docs, "source", "n_chars", _UNIMAX_BUDGET, max_epochs=_UNIMAX_EPOCHS
    )


@register(
    "unimax_mixture_sample",
    oracle=f"""
    WITH per AS (
      SELECT source, sum(n_chars)::BIGINT AS avail_tokens
      FROM documents GROUP BY 1
    ), c AS (
      SELECT source, avail_tokens,
             floor(avail_tokens * {_UNIMAX_EPOCHS})::BIGINT AS cap_tokens
      FROM per
    ), o AS (
      SELECT *,
             row_number() OVER (ORDER BY cap_tokens ASC, source ASC) - 1 AS i,
             count(*) OVER () AS n,
             coalesce(sum(cap_tokens) OVER (
               ORDER BY cap_tokens ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM c
    ), s AS (
      SELECT *,
             cap_tokens * (n - i) <= {_UNIMAX_BUDGET} - cum_before AS small
      FROM o
    ), a AS (
      SELECT coalesce(sum(CASE WHEN small THEN cap_tokens END), 0)::BIGINT
               AS small_sum,
             count(*) FILTER (NOT small)::BIGINT AS n_large
      FROM s
    ), alloc AS (
      SELECT source,
             CASE WHEN small THEN cap_tokens
                  ELSE least(cap_tokens,
                             greatest(floor(({_UNIMAX_BUDGET} - small_sum)
                                            / greatest(n_large, 1))::BIGINT, 0))
             END AS alloc_tokens
      FROM s CROSS JOIN a
    ), draws AS (
      SELECT d.doc_id, d.source, d.n_chars, al.alloc_tokens,
             sum(d.n_chars) OVER (
               PARTITION BY d.source
               ORDER BY (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                          / 4294967296.0) ASC,
                        d.doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents d JOIN alloc al USING (source)
    )
    SELECT doc_id, source, n_chars::BIGINT AS n_chars
    FROM draws WHERE cum - n_chars < alloc_tokens
    """,
)
def q_unimax_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mixing pipeline as ONE plan: UniMax water-filling
    computes each source's token allocation, and the allocation table
    flows straight into `token_budget_mixture`'s deterministic
    md5-draw admission — no driver round-trip between deciding the
    recipe and sampling it. The {_UNIMAX_BUDGET}-char corpus this
    admits is the uniform-as-possible mixture capped at
    {_UNIMAX_EPOCHS} epochs per source; the oracle replays allocation
    AND admission end-to-end."""
    from datas_spark.operators.corpus import token_budget_mixture, unimax_allocation

    docs = read_table(spark, sf_dir, "documents")
    alloc = unimax_allocation(
        docs, "source", "n_chars", _UNIMAX_BUDGET, max_epochs=_UNIMAX_EPOCHS
    )
    budgets = alloc.select("source", F.col("alloc_tokens").alias("budget"))
    out = token_budget_mixture(
        docs.select("doc_id", "source", "n_chars"),
        "source",
        "n_chars",
        budgets,
    )
    return out.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))


# ---------------------------------------------------------------------------
# round 6: balanced training-shard assignment (snake over size-desc rank)
# ---------------------------------------------------------------------------

@register(
    "balanced_shard_assignment",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY -n_chars ASC, doc_id ASC) - 1 AS rr
      FROM documents
    )
    SELECT doc_id, n_chars,
           (CASE WHEN (rr // 8) % 2 = 1 THEN 7 - (rr % 8) ELSE rr % 8 END)::INT
             AS shard
    FROM r
    """,
)
def q_balanced_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 near-equal-token training shards via deterministic snake
    assignment over the size-DESC skew-proof global rank (imbalance
    bounded by one largest document, no sequential LPT state, no
    partition-less window). Every data-parallel worker reads the same
    mass or the slowest shard sets the epoch time."""
    from datas_spark.operators.training import balanced_shards

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return balanced_shards(docs, "doc_id", "n_chars", n_shards=8)


@register(
    "dsir_ess_report",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, (source IN ('src0', 'src1')) AS tgt,
             lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
      FROM documents
    ), ct AS (
      SELECT t, count(*)::BIGINT AS ct FROM toks WHERE tgt GROUP BY 1
    ), cr AS (
      SELECT t, count(*)::BIGINT AS cr FROM toks GROUP BY 1
    ), vocab AS (
      SELECT cr.t, coalesce(ct.ct, 0)::BIGINT AS ct, cr.cr
      FROM cr LEFT JOIN ct USING (t)
    ), scal AS (
      SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr,
             count(*)::BIGINT AS v
      FROM vocab
    ), ratio AS (
      SELECT v.t,
             ln((v.ct + 1)::DOUBLE / (s.nt + s.v)::DOUBLE)
           - ln((v.cr + 1)::DOUBLE / (s.nr + s.v)::DOUBLE) AS lr
      FROM vocab v CROSS JOIN scal s
    ), scored AS (
      SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
             round(sum(r.lr), 6) AS dsir_weight
      FROM toks tk JOIN ratio r USING (t) GROUP BY 1
    ), weights AS (
      SELECT d.doc_id,
             CASE WHEN s.dsir_weight IS NOT NULL AND s.n_tokens > 0
                  THEN CAST(least(round(exp(s.dsir_weight
                                            / s.n_tokens::DOUBLE)
                                        * 1000000.0),
                                  1e18) AS BIGINT)
             END AS w
      FROM documents d LEFT JOIN scored s USING (doc_id)
    ), agg AS (
      SELECT count(w)::BIGINT AS n_docs,
             (count(*) - count(w))::BIGINT AS n_excluded,
             sum(w::HUGEINT) AS sw,
             sum(w::HUGEINT * w) AS sww,
             max(w) AS mx
      FROM weights
    )
    SELECT n_docs, n_excluded,
           CASE WHEN sww > 0 THEN
             round(sw::DOUBLE * sw::DOUBLE / sww::DOUBLE, 3)
           END AS ess,
           CASE WHEN sww > 0 THEN
             round(sw::DOUBLE * sw::DOUBLE / sww::DOUBLE
                   / n_docs::DOUBLE * 100.0, 4)
           END AS ess_pct,
           CASE WHEN sw > 0 THEN
             round(mx::DOUBLE / sw::DOUBLE * 100.0, 6)
           END AS max_w_share_pct
    FROM agg
    """,
)
def q_dsir_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size audit of the DSIR weights
    (`corpus.importance_weight_diagnostics`, Kong 1992): how
    degenerate is sampling ∝ the per-token tilt exp(weight/n_tokens)?
    ESS ≪ n means the resample would be near-copies of a few
    target-looking documents — the number to check BEFORE running the
    resample the `dsir_importance_weights` query prices. Exact
    e6-quantized moment sums; one combinable aggregate over the scored
    frame."""
    from datas_spark.operators.corpus import importance_weight_diagnostics

    docs = read_table(spark, sf_dir, "documents")
    scored = dsir_importance(
        docs, "doc_id", "text", F.col("source").isin("src0", "src1")
    )
    return importance_weight_diagnostics(scored, "dsir_weight", "n_tokens")
