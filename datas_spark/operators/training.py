"""Training-example constructors: sequence-window datasets (next-event
prediction) and deterministic negative sampling.

Reference parity: the reference builds SFT training subsets row-by-row
(SURVEY §2.5/§2.6); these are the two example-construction shapes a
recommendation / behavioral-sequence training pipeline adds — rows IN,
(features, label) rows OUT, as pure lazy plans.

Determinism: negative sampling draws with the engine-standard
``hash60`` md5-prefix hash (``functions/text.py``), so every draw is
reproducible bit-for-bit and mirror-able in the DuckDB oracle as
``('0x' || substr(md5(...), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datas_spark.functions.text import hash60

__all__ = ["next_event_examples", "negative_sample", "preference_pairs"]


def preference_pairs(
    df: DataFrame,
    prompt_col: str,
    response_col: str,
    score_col: str,
    margin: float,
    source_col: str | None = None,
    per_source_quota: int | None = None,
) -> DataFrame:
    """Chosen/rejected preference-pair construction — the DPO/RLHF
    post-training data shape (VERDICT r7 #7), generalizing the
    reference's scorer contract (reference ``README.md:28-39``,
    ``score_pipeline_rw.py:39-52``: reward scores exist precisely to
    rank competing outputs). Per prompt:

    - **chosen** = the top-scoring response; ties break to the LOWEST
      response id (deterministic, replayable in SQL);
    - **rejected** = the best-scoring response with
      ``score <= chosen_score - margin`` — the HARDEST margin-separated
      negative (a barely-worse response teaches more than a garbage
      one), same tie-break;
    - prompts with no margin-separated partner emit NO pair (a pair
      whose gap could be scorer noise is worse than no pair);
    - with ``per_source_quota``, each source keeps its top-N pairs by
      (chosen_score desc, prompt asc) — the per-source balance control
      every mixed-corpus preference set needs.

    Scale shape: both elections are rank-1 row_number windows
    PARTITIONED BY the prompt key (never partition-less; WindowGroupLimit
    prunes to the top row map-side), the chosen↔candidate match is one
    equi-join on the same key, and the quota is a per-source keyed
    window over the already prompt-reduced pair frame. Returns
    ``(prompt, chosen_id, chosen_score, rejected_id, rejected_score
    [, source])``."""
    p = F.col(prompt_col)
    w_chosen = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col).desc(), F.col(response_col).asc()
    )
    keep = [prompt_col, response_col, score_col] + (
        [source_col] if source_col else []
    )
    chosen = (
        df.select(*keep)
        .withColumn("__rn", F.row_number().over(w_chosen))
        .where(F.col("__rn") == 1)
        .select(
            p.alias("__p"),
            F.col(response_col).alias("chosen_id"),
            F.col(score_col).alias("chosen_score"),
            *([F.col(source_col).alias("source")] if source_col else []),
        )
    )
    cand = df.select(
        p.alias("__p"),
        F.col(response_col).alias("rejected_id"),
        F.col(score_col).alias("rejected_score"),
    )
    w_rej = Window.partitionBy("__p").orderBy(
        F.col("rejected_score").desc(), F.col("rejected_id").asc()
    )
    pairs = (
        chosen.join(cand, "__p")
        .where(F.col("rejected_score") <= F.col("chosen_score") - F.lit(margin))
        .withColumn("__rn", F.row_number().over(w_rej))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if per_source_quota is not None:
        if not source_col:
            raise ValueError("per_source_quota requires source_col")
        w_q = Window.partitionBy("source").orderBy(
            F.col("chosen_score").desc(), F.col("__p").asc()
        )
        pairs = (
            pairs.withColumn("__qn", F.row_number().over(w_q))
            .where(F.col("__qn") <= per_source_quota)
            .drop("__qn")
        )
    return pairs.select(
        F.col("__p").alias(prompt_col),
        "chosen_id",
        "chosen_score",
        "rejected_id",
        "rejected_score",
        *(["source"] if source_col else []),
    )


def next_event_examples(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    item_col: str | Column,
    seq_len: int = 8,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Sliding-window next-item training examples: for every event with
    at least one predecessor, emit the user's previous ``seq_len``
    items (in time order) as ``history`` and the current item as
    ``label`` — the (sequence → next action) dataset every session-
    based recommender / behavioral LM trains on.

    Ordering must be total per user: pass ``tiebreak_col`` (e.g. an
    event id) to break timestamp ties deterministically.

    Scale shape: ONE per-user window; the frame is row-bounded
    (``seq_len`` preceding), so state per row is O(seq_len) and the
    shuffle is a single hash exchange on the user key. Per-user volume
    is bounded by real activity; for pathological users compose with
    ``profile.heavy_keys`` and cap upstream. No self-join — the naive
    formulation (events × events on user within a row range) shuffles
    the fact table twice and explodes; the window form shuffles once.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(-seq_len, -1)
    )
    out = df.withColumn("history", F.collect_list(item).over(w)).withColumn(
        "label", item
    )
    return out.where(F.size("history") >= 1)


def negative_sample(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 4,
    oversample: int = 4,
) -> DataFrame:
    """Deterministic uniform negative sampling: for every user, up to
    ``k`` items they did NOT interact with — the standard negatives
    for implicit-feedback recommenders and contrastive training.

    Draw protocol (fully deterministic, no RNG state): candidate slot
    ``c`` of user ``u`` picks the item with dense index
    ``hash60(u || ':' || c) mod n_items``; positives and duplicate
    draws are discarded and the first ``k`` surviving slots (by slot
    order) are kept. ``oversample`` controls how many slots are drawn
    per kept negative (``k * oversample`` total) — with a big enough
    factor the probability a heavy user exhausts its slots is
    negligible; emit fewer rows (never wrong ones) otherwise.

    Scale shape: the item catalog gets a dense index from the
    skew-proof global rank (``with_row_id`` — range exchange, no
    single-reducer window); ``n_items`` is a 1-row broadcast; slot
    generation is a map-side ``explode(sequence)``; the catalog join
    keys on the dense index (AQE broadcasts a small catalog) and the
    positives check is ONE left-anti join on (user, item). Per-user
    candidate count is fixed at ``k * oversample``, so the final
    per-user rank window is O(k·oversample) rows per key — no skew.
    """
    from datas_spark.io.sources import with_row_id

    pos = interactions.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__i")
    ).distinct()
    items = with_row_id(pos.select("__i").distinct(), order_by="__i", name="__idx")
    n_items = items.agg(F.count(F.lit(1)).alias("__n"))
    m = int(k) * int(oversample)
    cand = (
        pos.select("__u")
        .distinct()
        .join(F.broadcast(n_items))
        .select(
            "__u",
            "__n",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__c"),
        )
        .withColumn(
            "__idx",
            F.pmod(
                hash60(F.concat(F.col("__u").cast("string"), F.lit(":"), F.col("__c"))),
                F.col("__n"),
            ),
        )
    )
    drawn = cand.join(items, "__idx").select("__u", "__i", "__c")
    # same item drawn in two slots → keep the earliest slot only
    drawn = drawn.groupBy("__u", "__i").agg(F.min("__c").alias("__c"))
    negatives = drawn.join(pos, ["__u", "__i"], "left_anti")
    ranked = negatives.withColumn(
        "__r",
        F.row_number().over(Window.partitionBy("__u").orderBy("__c")),
    )
    return ranked.where(F.col("__r") <= k).select(
        F.col("__u").alias(user_col),
        F.col("__i").alias(item_col),
        F.col("__c").alias("slot"),
    )


def balanced_shards(
    df: DataFrame, id_col: str, size_col: str, n_shards: int
) -> DataFrame:
    """Assign rows to ``n_shards`` near-equal-total-``size_col`` shards
    — the training-shard packer: every data-parallel worker should read
    the same token mass or the slowest shard sets the epoch time.

    Deterministic snake (boustrophedon) assignment over the size-DESC
    global rank: rank r goes to shard ``r % n`` on even blocks and
    ``n-1 - r % n`` on odd blocks, so each consecutive block of n rows
    distributes its within-block size gradient in alternating
    directions — the classic near-LPT guarantee (imbalance bounded by
    one largest item) without LPT's sequential bin state.

    The global rank is ``with_row_id``'s skew-proof range exchange (no
    partition-less window); the assignment itself is one map-side
    expression. Returns the input plus ``shard`` (int).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from datas_spark.io.sources import with_row_id

    ranked = with_row_id(
        df,
        [(-F.col(size_col).cast("long")).alias("__negsize"), F.col(id_col)],
        name="__r",
    )
    pos = F.col("__r") % n_shards
    block_odd = (F.col("__r") / n_shards).cast("long") % 2 == 1
    shard = F.when(block_odd, F.lit(n_shards - 1) - pos).otherwise(pos)
    return ranked.withColumn("shard", shard.cast("int")).drop("__r")
