"""Task-vector / model-merging algebra on long parameter tables
(SURVEY §2.7, T1–T11).

The reference manipulates checkpoints as in-memory dicts
``param_name → tensor`` (``/root/reference/src/utils/merging.py``,
``get_taskV.py``). We model a checkpoint as a **long relational table**

    (key: string, idx: bigint, value: double)

one row per scalar parameter (``idx`` = position in the flattened
tensor; a separate dims table keeps shapes, T10). Every merge op then
becomes a join + arithmetic — and arbitrarily large checkpoints merge
with cluster parallelism instead of host RAM.

Scale notes: joins are equi-joins on (key, idx) — co-partitioned if the
tables were written bucketed by (key, idx); coefficient tables (T4) are
tiny and broadcast; TIES per-row top-k (T6) is a window over
(key, row) — partition count = #parameter-matrix rows, no skew since
rows are equal-length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "task_vector",
    "tv_add",
    "tv_negate",
    "tv_weighted_merge",
    "tv_apply",
    "ties_topk_mask",
    "ties_elect_sign",
    "ties_disjoint_merge",
    "ties_merge",
    "flatten_positions",
    "key_symmetric_difference",
    "tv_cosine_by_key",
    "dare_drop_rescale",
    "fisher_from_grads",
    "fisher_weighted_merge",
    "slerp_merge",
]

_KEYS = ["key", "idx"]


def task_vector(finetuned: DataFrame, pretrained: DataFrame, skip_keys: list[str] | None = None) -> DataFrame:
    """T1: ``tv = finetuned − pretrained`` over shared (key, idx)
    (merging.py:44-50). ``skip_keys`` mirrors the reference's int64/uint8
    skip (:48-49) — callers pass the keys of non-float params."""
    f, p = finetuned.alias("f"), pretrained.alias("p")
    out = f.join(p, _KEYS).select(
        "key", "idx", (F.col("f.value") - F.col("p.value")).alias("value")
    )
    if skip_keys:
        out = out.where(~F.col("key").isin(skip_keys))
    return out


def tv_add(a: DataFrame, b: DataFrame) -> DataFrame:
    """T2: elementwise add over shared keys (merging.py:52-61); rows
    present on only one side are dropped (reference warns + skips)."""
    return a.alias("a").join(b.alias("b"), _KEYS).select(
        "key", "idx", (F.col("a.value") + F.col("b.value")).alias("value")
    )


def tv_negate(tv: DataFrame) -> DataFrame:
    """T3 (merging.py:68-74)."""
    return tv.select("key", "idx", (-F.col("value")).alias("value"))


def tv_weighted_merge(tvs: list[DataFrame], coefs: list[float]) -> DataFrame:
    """T4: ``Σ coef_k · tv_k`` (merging.py:76-81). Union with vector id +
    groupBy — partial aggregation handles the sum map-side."""
    tagged = [
        tv.select("key", "idx", (F.col("value") * F.lit(c)).alias("value"))
        for tv, c in zip(tvs, coefs)
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out.groupBy(*_KEYS).agg(F.sum("value").alias("value"))


def tv_apply(pretrained: DataFrame, tv: DataFrame, scaling: float = 1.0) -> DataFrame:
    """T5: ``new = pretrained + scaling · tv`` (merging.py:83-95); keys
    missing from the task vector pass through unchanged (left join —
    the reference warns and keeps the pretrained value)."""
    p, t = pretrained.alias("p"), tv.alias("t")
    return p.join(t, _KEYS, "left").select(
        "key",
        "idx",
        (
            F.col("p.value") + F.lit(scaling) * F.coalesce(F.col("t.value"), F.lit(0.0))
        ).alias("value"),
    )


def ties_topk_mask(
    tv: DataFrame,
    k_pct: float,
    row_size: int | None = None,
    global_topk: bool = False,
) -> DataFrame:
    """T6: per parameter-matrix row, keep entries whose |value| is in the
    top K%; zero the rest (merging.py:186-211). ``global_topk=True``
    masks over the WHOLE flattened vector instead (the reference
    driver's flow — flat vectors from get_taskV.py:20-36), ranking in a
    single window partition; see ties_merge for the approx-threshold
    swap at extreme scale.

    The reference computes the kth largest |value| per row and keeps
    ``abs(M) >= kth`` — i.e. ties at the threshold are KEPT. We mirror
    that with a rank over |value| desc: keep rank <= ceil(K% * row_n)
    extended to all ties at the cutoff via ``min(|value|)`` of the kept
    set — expressed directly as ``abs(value) >= kth_value`` where
    kth_value is the k-th largest per row.

    ``row`` = matrix row = idx // row_size when the long table is a
    flattened 2-D tensor; with ``row_size=None`` the whole key is one
    row (1-D tensors).
    """
    if row_size and not global_topk:
        rowed = tv.withColumn("__row", (F.col("idx") / F.lit(row_size)).cast("long"))
    else:
        rowed = tv.withColumn("__row", F.lit(0))
    part = ["__row"] if global_topk else ["key", "__row"]
    w = Window.partitionBy(*part)
    n = F.count(F.lit(1)).over(w)
    k = F.greatest((n * F.lit(k_pct)).cast("long"), F.lit(1))
    wr = Window.partitionBy(*part).orderBy(F.abs(F.col("value")).desc())
    ranked = rowed.withColumn("__rank", F.row_number().over(wr)).withColumn("__k", k)
    # kth largest |value| per row, then keep all entries >= it (ties kept,
    # matching torch.kthvalue + `abs(M) >= kth` at merging.py:204-207)
    kth = F.max(F.when(F.col("__rank") == F.col("__k"), F.abs("value"))).over(w)
    return (
        ranked.withColumn("__kth", kth)
        .select(
            "key",
            "idx",
            F.when(F.abs("value") >= F.col("__kth"), F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )


def ties_elect_sign(tvs: DataFrame, method: str = "mass") -> DataFrame:
    """T7: per (key, idx) elect a sign (merging.py:214-233).

    ``tvs`` is a union of task vectors tagged with ``vector_id``.
    Sign = sign of Σ values per entry; zero-sum entries are resolved by
    ``method`` (merging.py:226-233 resolve_zero_signs):
    - ``mass`` (the reference's "majority"): inherit the global majority
      sign over nonzero entries.
    - ``minority``: inherit the NEGATED global majority sign.
    Returns (key, idx, sign).
    """
    if method not in ("mass", "minority"):
        raise ValueError("sign election method must be 'mass' or 'minority'")
    per_entry = tvs.groupBy(*_KEYS).agg(F.signum(F.sum("value")).alias("sign"))
    # global majority sign among nonzero entries (scalar, broadcast)
    majority = per_entry.where(F.col("sign") != 0).agg(
        F.signum(F.sum("sign")).alias("gsign")
    )
    if method == "mass":
        fallback = F.coalesce(F.col("gsign"), F.lit(1.0))
    else:
        fallback = F.coalesce(-F.col("gsign"), F.lit(-1.0))
    return per_entry.crossJoin(broadcast(majority)).select(
        "key",
        "idx",
        F.when(F.col("sign") != 0, F.col("sign")).otherwise(fallback).alias("sign"),
    )


def ties_disjoint_merge(tvs: DataFrame, signs: DataFrame, mode: str = "mean") -> DataFrame:
    """T8: keep entries agreeing with the elected sign, then aggregate
    (merging.py:239-267): mean = sum(agree)/max(count_agree,1);
    sum; max = max|value|·sign."""
    j = tvs.join(signs, _KEYS)
    agree = F.col("value") * F.col("sign") > 0
    g = j.groupBy(*_KEYS)
    if mode == "mean":
        out = g.agg(
            (
                F.coalesce(F.sum(F.when(agree, F.col("value"))), F.lit(0.0))
                / F.greatest(
                    F.count(F.when(agree, F.lit(1))).cast("double"), F.lit(1.0)
                )
            ).alias("value")
        )
    elif mode == "sum":
        out = g.agg(F.coalesce(F.sum(F.when(agree, F.col("value"))), F.lit(0.0)).alias("value"))
    elif mode == "max":
        out = g.agg(
            (
                F.coalesce(F.max(F.when(agree, F.abs("value"))), F.lit(0.0))
                * F.first("sign")
            ).alias("value")
        )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    return out


def ties_merge(
    tvs: list[DataFrame],
    k_pct: float = 0.2,
    mode: str = "mean",
    row_size: int | None = None,
    global_topk: bool = False,
    sign_method: str = "mass",
) -> DataFrame:
    """T9: full TIES driver — top-k mask each vector → elect signs →
    disjoint merge (merging.py:154-171) as ONE lazy plan.

    ``global_topk=True`` reproduces the reference DRIVER's actual data
    flow (ties_merging at merging.py:155-163 over get_taskV.py:20-36
    flat vectors): each checkpoint is ONE flattened vector and the
    top-K% magnitude mask spans the whole model, not each matrix row.
    Exact global selection ranks each vector in a single window
    partition — fine up to ~10⁸ params/executor; beyond that, swap the
    rank for an ``approx_percentile(abs(value), 1 - k_pct)`` threshold
    per vector_id (distributed, map-side partial) and accept boundary
    fuzz of ±accuracy⁻¹ quantile mass — the mask keeps |v| >= threshold
    either way.

    ``sign_method``: zero-sum sign resolution (merging.py:226-233) —
    ``mass`` inherits the global majority sign, ``minority`` its
    negation.

    Fused formulation (vs composing T6→T7→T8 literally): the naive
    composition references the masked union from four plan branches
    (sign groupBy, global majority, and both join sides), so Spark
    evaluates the expensive mask windows 4×. Here ONE groupBy over the
    masked union computes every sufficient statistic (sum, positive/
    negative sums+counts+maxes); sign election and the disjoint merge
    collapse to column arithmetic. Semantics are identical —
    oracle-checked against the step-by-step SQL.

    Exchange alignment (the scale story): ONE explicit
    ``repartition(key, __row)`` satisfies BOTH the mask window
    (partition keys (vector_id, key, __row) ⊇ the hash keys) and the
    per-entry groupBy — grouped on (key, __row, idx), where adding
    ``__row`` (= idx // row_size, functionally dependent on idx) keeps
    the groups identical while letting Catalyst prove the existing
    hash partitioning already clusters them. The big union is shuffled
    ONCE; the only other exchange is the narrow per-entry table,
    re-shuffled so the global-majority scalar and the merge branch
    share it (exchange reuse) instead of re-executing the mask tree.
    Measured at sf0.1: 1.75s → 1.07s, 2 big shuffles → 1.
    """
    tagged = [tv.withColumn("vector_id", F.lit(i)) for i, tv in enumerate(tvs)]
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)

    # T6 mask, one window pass over the union (partitions include
    # vector_id so each vector's rows rank independently)
    if global_topk:
        rowed = union.withColumn("__row", F.lit(0))
        # the mask spans every key: the window's own exchange clusters
        # each whole vector (exact global rank — see docstring for the
        # approx-threshold swap at extreme scale)
        pw = ["vector_id"]
    elif row_size:
        rowed = union.withColumn("__row", (F.col("idx") / F.lit(row_size)).cast("long"))
        rowed = rowed.repartition("key", "__row")
        pw = ["vector_id", "key", "__row"]
    else:
        rowed = union.withColumn("__row", F.lit(0))
        rowed = rowed.repartition("key", "__row")
        pw = ["vector_id", "key", "__row"]
    w = Window.partitionBy(*pw)
    wr = Window.partitionBy(*pw).orderBy(F.abs(F.col("value")).desc())
    n = F.count(F.lit(1)).over(w)
    k = F.greatest((n * F.lit(k_pct)).cast("long"), F.lit(1))
    ranked = rowed.withColumn("__rank", F.row_number().over(wr)).withColumn("__k", k)
    kth = F.max(F.when(F.col("__rank") == F.col("__k"), F.abs("value"))).over(w)
    masked = ranked.withColumn("__kth", kth).select(
        "key",
        "__row",
        "idx",
        F.when(F.abs("value") >= F.col("__kth"), F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("value"),
    )

    # one pass: every per-entry statistic T7/T8 need; grouping on
    # (key, __row, idx) — same groups as (key, idx), but provably
    # clustered by the exchange above (no second big shuffle)
    pos, neg = F.col("value") > 0, F.col("value") < 0
    per_entry = masked.groupBy("key", "__row", "idx").agg(
        F.signum(F.sum("value")).alias("__sign"),
        F.coalesce(F.sum(F.when(pos, F.col("value"))), F.lit(0.0)).alias("__pos_sum"),
        F.count(F.when(pos, F.lit(1))).cast("double").alias("__pos_cnt"),
        F.coalesce(F.sum(F.when(neg, F.col("value"))), F.lit(0.0)).alias("__neg_sum"),
        F.count(F.when(neg, F.lit(1))).cast("double").alias("__neg_cnt"),
        F.max(F.when(pos, F.col("value"))).alias("__max_pos"),
        F.max(F.when(neg, -F.col("value"))).alias("__max_neg_abs"),
    )
    # narrow exchange: both consumers below (majority scalar + merge)
    # reuse this shuffle instead of re-executing the mask tree
    per_entry = per_entry.repartition("key", "__row")
    # global majority of nonzero signs (zeros contribute 0 to the sum)
    majority = per_entry.agg(F.signum(F.sum("__sign")).alias("__gsign"))
    if sign_method == "mass":
        fallback = F.coalesce(F.col("__gsign"), F.lit(1.0))
    elif sign_method == "minority":
        fallback = F.coalesce(-F.col("__gsign"), F.lit(-1.0))
    else:
        raise ValueError("sign_method must be 'mass' or 'minority'")
    elected = per_entry.crossJoin(broadcast(majority)).withColumn(
        "__s",
        F.when(F.col("__sign") != 0, F.col("__sign")).otherwise(fallback),
    )
    s = F.col("__s")
    if mode == "mean":
        value = (
            F.when(s > 0, F.col("__pos_sum") / F.greatest(F.col("__pos_cnt"), F.lit(1.0)))
            .when(s < 0, F.col("__neg_sum") / F.greatest(F.col("__neg_cnt"), F.lit(1.0)))
            .otherwise(F.lit(0.0))
        )
    elif mode == "sum":
        value = (
            F.when(s > 0, F.col("__pos_sum"))
            .when(s < 0, F.col("__neg_sum"))
            .otherwise(F.lit(0.0))
        )
    elif mode == "max":
        value = (
            F.when(s > 0, F.coalesce(F.col("__max_pos"), F.lit(0.0)))
            .when(s < 0, -F.coalesce(F.col("__max_neg_abs"), F.lit(0.0)))
            .otherwise(F.lit(0.0))
        )
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    return elected.select("key", "idx", value.alias("value"))


def flatten_positions(ckpt: DataFrame) -> DataFrame:
    """T10 (get_taskV.py:20-36): state_dict → flat vector. In the long
    layout the "flat vector" is just a global position: sort keys, then
    ``pos = offset(key) + idx``.

    Scale: offsets come from a per-key count aggregate (one row per
    tensor — tiny) cumulated with a window over keys and broadcast back;
    the big table is never globally sorted (a global ``row_number``
    would single-partition 10¹¹ rows).
    """
    dims = ckpt.groupBy("key").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, -1)
    offsets = dims.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w), F.lit(0))
    ).select("key", "__offset")
    wk = Window.partitionBy("key").orderBy("idx")
    return (
        ckpt.withColumn("__rn", F.row_number().over(wk))
        .join(broadcast(offsets), "key")
        .select(
            "key",
            "idx",
            (F.col("__offset") + F.col("__rn") - 1).alias("pos"),
            "value",
        )
    )


def key_symmetric_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """T11: param keys present in exactly one checkpoint
    (get_taskV.py:78-99) — full outer join on distinct keys."""
    ka = a.select("key").distinct().withColumn("__in_a", F.lit(1))
    kb = b.select("key").distinct().withColumn("__in_b", F.lit(1))
    return (
        ka.join(kb, "key", "full_outer")
        .where(F.col("__in_a").isNull() | F.col("__in_b").isNull())
        .select(
            "key",
            F.when(F.col("__in_a").isNotNull(), F.lit("a")).otherwise(F.lit("b")).alias("side"),
        )
    )


def tv_cosine_by_key(
    a: DataFrame,
    b: DataFrame,
    cents_scale: int = 100,
) -> DataFrame:
    """Per-key (per-layer) cosine similarity between two task vectors —
    the interference diagnostic run before any merge: layers where two
    task vectors point in opposite directions are exactly where naive
    averaging destroys both skills (the observation TIES/DARE exist to
    fix). Returns (key, n, cos); NULL cos for a zero-norm side.

    Exactness: values quantize to ``cents_scale`` integers so the dot
    product and both norms reduce as exact BIGINT sums (order-free,
    engine-identical); the one cosine division happens at the end.
    One inner join on (key, idx) + one combinable aggregate.
    """
    av = a.select(
        "key", "idx", F.round(F.col("value") * cents_scale).cast("long").alias("__a")
    )
    bv = b.select(
        "key", "idx", F.round(F.col("value") * cents_scale).cast("long").alias("__b")
    )
    j = av.join(bv, ["key", "idx"])
    g = j.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__a") * F.col("__b")).alias("__dot"),
        F.sum(F.col("__a") * F.col("__a")).alias("__na"),
        F.sum(F.col("__b") * F.col("__b")).alias("__nb"),
    )
    cos = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        F.col("__dot") / (F.sqrt(F.col("__na")) * F.sqrt(F.col("__nb"))),
    )
    return g.select("key", "n", F.round(cos, 6).alias("cos"))


def dare_drop_rescale(
    tv: DataFrame,
    p: float = 0.9,
    seed: str = "dare",
) -> DataFrame:
    """DARE (Yu et al. 2024, "Language Models are Super Mario"):
    randomly DROP a fraction ``p`` of a task vector's entries and
    RESCALE the survivors by ``1/(1−p)`` — an unbiased sparsification
    that keeps the merged model's expected delta while killing most
    interference terms.

    OUR drop mask is the engine-standard md5 draw on (seed, key, idx)
    — no RNG state, bit-identical on any partitioning and replayable
    in the oracle as ``('0x' || substr(md5(...), 1, 8))::BIGINT /
    4294967296.0 >= p``. Pure map-side expression; dropped entries are
    removed (sparse representation — the long-table layout makes the
    absent-row = zero convention free).
    """
    if not 0 <= p < 1:
        raise ValueError(f"p must be in [0, 1), got {p}")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.lit(":"),
                        F.col("key").cast("string"),
                        F.lit(":"),
                        F.col("idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return tv.where(u >= p).withColumn(
        "value", F.col("value") / F.lit(1.0 - p)
    )


def fisher_from_grads(
    grads: DataFrame,
    quantize_dp: int = 12,
) -> DataFrame:
    """Diagonal empirical Fisher from a long per-example gradient table
    ``(id, key, idx, value)`` (the `scoring.grad_capture_long` layout):

        F[key, idx] = (1/n) Σ_examples grad²

    — the per-parameter importance weight of Matena & Raffel 2022
    ("Merging Models with Fisher-Weighted Averaging", eq. 4; the
    reference's gradient-capture intent is ``get_info.py:43-68``).

    Determinism discipline: gradients quantize to e12 integers before
    the moment sum (squares exceed int64 at corpus scale → decimal-38,
    the CUPED exact-moments pattern), so the Fisher is exact integer
    algebra + one division — bit-identical on any partitioning and
    replayable in a SQL oracle. ONE combinable aggregate over the
    gradient table; output is |params|·dim rows (model-sized, small).
    """
    q = float(10 ** quantize_dp)
    ge = F.round(F.col("value") * q).cast("long").cast("decimal(38,0)")
    return (
        grads.groupBy("key", "idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(ge * ge).alias("__sgg"),
        )
        .select(
            "key",
            "idx",
            (
                F.col("__sgg").cast("double")
                / F.col("__n").cast("double")
                / F.lit(q * q)
            ).alias("fisher"),
        )
    )


def fisher_weighted_merge(
    models: list[DataFrame],
    fishers: list[DataFrame],
    coefs: list[float] | None = None,
) -> DataFrame:
    """Fisher-weighted model averaging (Matena & Raffel 2022, eq. 7):

        merged[key, idx] = Σ_k λ_k·F_k·θ_k / Σ_k λ_k·F_k

    — each parameter is averaged with per-model weights proportional
    to that model's (diagonal) Fisher information there, so a model
    that is *certain* about a weight dominates it while an indifferent
    model defers. With uniform Fisher this reduces exactly to T4's
    plain weighted merge with normalized coefficients (property-tested).

    Inputs: ``models[k]`` long checkpoints ``(key, idx, value)``,
    ``fishers[k]`` long weights ``(key, idx, fisher)`` (from
    `fisher_from_grads` or any per-parameter importance), optional
    per-model scalars ``coefs`` (default 1.0).

    Plan shape: each model equi-joins its own Fisher on (key, idx)
    (co-partitioned if written bucketed), the k tagged branches union,
    and ONE groupBy(key, idx) reduces them — partial aggregation
    handles the k-way sum map-side, so the only shuffle is the one the
    merge inherently needs. Numerator and denominator fold over the
    model-tag-sorted struct array (ordered fold — cross-engine
    bit-stable float sums, the lang_source_mi discipline). Parameters
    where Σ λ_k·F_k = 0 (every model indifferent) yield NULL rather
    than dividing by zero.
    """
    if len(models) != len(fishers) or not models:
        raise ValueError(
            f"need equal non-empty models/fishers, got "
            f"{len(models)}/{len(fishers)}"
        )
    if coefs is None:
        coefs = [1.0] * len(models)
    if len(coefs) != len(models):
        raise ValueError(f"coefs length {len(coefs)} != models {len(models)}")
    tagged = []
    for t, (m, fi, c) in enumerate(zip(models, fishers, coefs)):
        w = F.lit(float(c)) * F.col("f.fisher")
        tagged.append(
            m.alias("m")
            .join(fi.alias("f"), _KEYS)
            .select(
                "key",
                "idx",
                F.struct(
                    F.lit(t).alias("t"),
                    w.alias("w"),
                    (w * F.col("m.value")).alias("wv"),
                ).alias("__s"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    arr = F.array_sort(F.collect_list("__s"))
    agg = u.groupBy(*_KEYS).agg(arr.alias("__a"))
    num = F.aggregate(
        F.col("__a"), F.lit(0.0), lambda acc, x: acc + x["wv"]
    )
    den = F.aggregate(
        F.col("__a"), F.lit(0.0), lambda acc, x: acc + x["w"]
    )
    return agg.select(
        "key", "idx", F.when(den != 0.0, num / den).alias("value")
    )


def slerp_merge(
    a: DataFrame,
    b: DataFrame,
    t: float = 0.5,
    scale: int = 1_000_000,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-layer spherical linear interpolation between two checkpoints
    (the SLERP member of the merging family — the reference's
    `tv_apply` (merging.py:83-95) is the linear special case;
    TIES/DARE/Fisher are done):

        Ω_key  = arccos( a·b / (‖a‖‖b‖) )           (per layer)
        merged = sin((1−t)Ω)/sin(Ω) · a + sin(tΩ)/sin(Ω) · b

    — interpolating along the great circle preserves parameter-vector
    NORM where plain lerp shrinks it (the geometric argument behind
    SLERP merges of fine-tunes; Shoemake 1985 for the formula).

    Determinism discipline (the `fisher_from_grads` pattern): both
    layers' dot/norm moments come from e6-quantized integers
    (decimal-38 products — exact on any partitioning and replayable as
    HUGEINT sums in SQL), so cosΩ is bit-identical cross-engine; the
    one acos + three sin per LAYER are followed by a 12-dp weight
    resync, which absorbs libm last-ulp differences. Degenerate layers
    — near-collinear (sin Ω < eps) or zero-norm — fall back to plain
    lerp weights (1−t, t), the standard SLERP convention (and the
    t=0/t=1 endpoints hold exactly: sin(Ω)/sin(Ω) quantizes to 1,
    sin(0) to 0).

    Plan shape: ONE equi-join of the two checkpoints on (key, idx)
    feeds both the per-layer moment aggregate (combinable, |layers|
    rows out) and the output projection; the |layers|-row weight table
    broadcasts back. Two scans of the join, zero extra shuffles.
    """
    if not 0.0 <= t <= 1.0:
        raise ValueError(f"t must be in [0, 1], got {t}")
    q = lambda c: (  # noqa: E731
        F.round(c.cast("double") * scale).cast("long").cast("decimal(38,0)")
    )
    j = (
        a.alias("a")
        .join(b.alias("b"), _KEYS)
        .select(
            "key",
            "idx",
            F.col("a.value").cast("double").alias("__av"),
            F.col("b.value").cast("double").alias("__bv"),
            q(F.col("a.value")).alias("__qa"),
            q(F.col("b.value")).alias("__qb"),
        )
        .localCheckpoint(eager=False)
    )
    m = j.groupBy("key").agg(
        F.sum(F.col("__qa") * F.col("__qb")).alias("__dot"),
        F.sum(F.col("__qa") * F.col("__qa")).alias("__na"),
        F.sum(F.col("__qb") * F.col("__qb")).alias("__nb"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    cosw = F.least(
        F.greatest(
            dd("__dot") / (F.sqrt(dd("__na")) * F.sqrt(dd("__nb"))),
            F.lit(-1.0),
        ),
        F.lit(1.0),
    )
    omega = F.acos(cosw)
    sino = F.sin(omega)
    lt = 1.0 - float(t)
    degenerate = (
        (F.col("__na") <= 0) | (F.col("__nb") <= 0) | (sino < F.lit(float(eps)))
    )
    wa = F.when(degenerate, F.lit(lt)).otherwise(
        F.round(F.sin(F.lit(lt) * omega) / sino, 12)
    )
    wb = F.when(degenerate, F.lit(float(t))).otherwise(
        F.round(F.sin(F.lit(float(t)) * omega) / sino, 12)
    )
    w = m.select("key", wa.alias("__wa"), wb.alias("__wb"))
    return j.join(broadcast(w), "key").select(
        "key",
        "idx",
        (
            F.col("__wa") * F.col("__av") + F.col("__wb") * F.col("__bv")
        ).alias("value"),
    )
