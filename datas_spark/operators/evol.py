"""Evol-Instruct prompt-evolution schedules — the engine counterpart
of the reference's ABSENT ``evol_schedules`` module (imported at
``/root/reference/main.py:11`` but missing from the repo; SURVEY §0
lists it as intended surface). Two halves:

1. **Evolution prompt constructors** (Xu et al. 2023, WizardLM —
   public method): four depth operations (add constraints, deepen,
   concretize, require step-by-step reasoning) and one breadth
   operation (new instruction in the same domain), each a pure column
   expression over the alpaca frame — exactly the P3
   ``alpaca_prompt`` shape, ending at the model boundary (the prompt
   that WOULD be sent to the generator). The method for (id, round)
   picks deterministically by md5, so a schedule is reproducible in
   ANSI SQL. Round chaining is real: round r's prompt wraps round
   r−1's instruction; with no generator in the engine, the evolved
   instruction is the deterministic marker ``[method] `` + previous —
   the bookkeeping data flow without pretending to generate.

2. **Round bookkeeping** (reference ``main.py:37-52``: the
   ``rd_0_labeled.json / rd_N_unlabeled.json`` pool files): the
   labeled pool starts from a seed predicate and each round promotes
   the top-k most-uncertain rows from the ANTI-JOIN remainder — the
   multi-round composition of the single-round
   ``active_learning_round`` query. The labeled frame stays k·N+seed
   rows; the anti-join keeps the corpus-sized side un-shuffled
   (broadcast of the small labeled set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EVOL_METHODS",
    "evol_active_loop",
    "evol_prompt",
    "evol_prompt_schedule",
    "evol_round_pools",
]

# fixed method order — index = md5(id || ':' || round) mod 5, so the
# schedule replays anywhere (4 depth ops + 1 breadth op, WizardLM's set)
EVOL_METHODS: list[tuple[str, str]] = [
    (
        "constraints",
        "Rewrite the following instruction by adding one more constraint "
        "or requirement: ",
    ),
    (
        "deepen",
        "Rewrite the following instruction so that the depth and breadth "
        "of the inquiry increase: ",
    ),
    (
        "concretize",
        "Rewrite the following instruction by replacing general concepts "
        "with more specific concepts: ",
    ),
    (
        "reasoning",
        "Rewrite the following instruction to explicitly request "
        "multiple-step reasoning: ",
    ),
    (
        "breadth",
        "Create a brand-new instruction in the same domain as, but rarer "
        "than, the following: ",
    ),
]


def _method_index(id_col: Column, rnd: int) -> Column:
    """Deterministic method pick for (id, round): md5-uint32 mod the
    method count — the same hash family as every proxy scorer."""
    key = F.concat(id_col.cast("string"), F.lit(f":{rnd}"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(len(EVOL_METHODS))
    ).cast("int")


def evol_prompt(instruction: Column | str, method: str) -> Column:
    """One evolution prompt (template ‖ instruction) for a fixed
    method — the P3-shaped constructor."""
    templates = dict(EVOL_METHODS)
    if method not in templates:
        raise ValueError(
            f"unknown evol method {method!r}; known: {sorted(templates)}"
        )
    c = F.col(instruction) if isinstance(instruction, str) else instruction
    return F.concat(F.lit(templates[method]), c)


def evol_prompt_schedule(
    df: DataFrame,
    id_col: str,
    instruction_col: str,
    n_rounds: int = 3,
) -> DataFrame:
    """The full N-round evolution schedule as ONE map-only pass:
    returns ``(id_col, round int, method string, prompt string)`` with
    one row per (input row, round). Round r's prompt wraps the round
    r−1 evolved instruction (marker-chained, see module docstring);
    the md5 method pick, the chaining, and the templates all replay in
    SQL, so the schedule hash-checks.

    Plan: every round's struct is built in a single projection and
    explodes once (array projected FIRST, then ``explode_outer`` — the
    InferFiltersFromGenerate discipline); no shuffle anywhere.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    names = F.array(*[F.lit(n) for n, _ in EVOL_METHODS])
    tmpls = F.array(*[F.lit(t) for _, t in EVOL_METHODS])
    prev = F.col(instruction_col)
    rows = []
    for r in range(1, n_rounds + 1):
        idx = _method_index(F.col(id_col), r) + F.lit(1)  # element_at is 1-based
        method = F.element_at(names, idx)
        prompt = F.concat(F.element_at(tmpls, idx), prev)
        rows.append(
            F.struct(
                F.lit(r).alias("round"),
                method.alias("method"),
                prompt.alias("prompt"),
            )
        )
        prev = F.concat(F.lit("["), method, F.lit("] "), prev)
    arr = df.select(F.col(id_col), F.array(*rows).alias("__sched"))
    return (
        arr.select(F.col(id_col), F.explode_outer("__sched").alias("__e"))
        .where(F.col("__e").isNotNull())
        .select(
            F.col(id_col),
            F.col("__e")["round"].alias("round"),
            F.col("__e")["method"].alias("method"),
            F.col("__e")["prompt"].alias("prompt"),
        )
    )


def evol_active_loop(
    df: DataFrame,
    id_col: str,
    instruction_col: str,
    k: int = 8,
    n_rounds: int = 3,
) -> DataFrame:
    """The composed select → evolve → re-score loop (reference
    ``main.py:37-52,487-510`` — VERDICT r10 #6): `evol_round_pools`'
    election and `evol_prompt_schedule`'s evolution were verified
    separately; this is the reference's intended LOOP, where the
    re-score of an evolved instruction feeds the NEXT round's
    election, in one lazy plan.

    Per round r (state = every row's current instruction + proxy
    confidence, init ``md5-unit('ev0:' ‖ id)``):

    1. promote the top-``k`` rows by (conf DESC, id ASC) — rows CAN
       be re-promoted in later rounds, exactly the Evol-Instruct
       multi-round evolution of the same instruction;
    2. each promoted row gets its round-r md5-elected method and the
       generator-ready prompt (template ‖ current instruction);
    3. its instruction marker-chains (``[method] `` ‖ previous) and
       its confidence RE-SCORES as the md5-unit of the round's prompt
       — state the next round's election actually reads.

    Returns one row per promotion event: ``(id_col, round int,
    method, prompt, conf_after double)``.

    Plan shape: each round is one TakeOrdered top-k over the narrow
    (id, conf) projection (never a global sort) + one broadcast left
    join of the k-row pick; state localCheckpoints per round so the
    N-round lineage stays flat. No driver collects.
    """
    from pyspark.sql.functions import broadcast

    from datas_spark.operators.scoring import hash_unit_interval

    if k < 1 or n_rounds < 1:
        raise ValueError(f"need k >= 1 and n_rounds >= 1, got {k}/{n_rounds}")
    names = F.array(*[F.lit(n) for n, _ in EVOL_METHODS])
    tmpls = F.array(*[F.lit(t) for _, t in EVOL_METHODS])
    state = df.select(
        F.col(id_col),
        F.col(instruction_col).alias("__instr"),
        hash_unit_interval(
            F.concat(F.lit("ev0:"), F.col(id_col).cast("string"))
        ).alias("__conf"),
    ).localCheckpoint(eager=False)
    events: DataFrame | None = None
    for r in range(1, n_rounds + 1):
        pick = (
            state.select(F.col(id_col), "__conf")
            .orderBy(F.col("__conf").desc(), F.col(id_col).asc())
            .limit(int(k))
            .select(F.col(id_col), F.lit(1).alias("__sel"))
        )
        st = state.join(broadcast(pick), id_col, "left")
        idx = _method_index(F.col(id_col), r) + F.lit(1)
        method = F.element_at(names, idx)
        prompt = F.concat(F.element_at(tmpls, idx), F.col("__instr"))
        new_conf = hash_unit_interval(prompt)
        ev_r = st.where(F.col("__sel").isNotNull()).select(
            F.col(id_col),
            F.lit(r).alias("round"),
            method.alias("method"),
            prompt.alias("prompt"),
            new_conf.alias("conf_after"),
        )
        state = st.select(
            F.col(id_col),
            F.when(
                F.col("__sel").isNotNull(),
                F.concat(F.lit("["), method, F.lit("] "), F.col("__instr")),
            )
            .otherwise(F.col("__instr"))
            .alias("__instr"),
            F.when(F.col("__sel").isNotNull(), new_conf)
            .otherwise(F.col("__conf"))
            .alias("__conf"),
        ).localCheckpoint(eager=False)
        events = ev_r if events is None else events.unionByName(ev_r)
    return events


def evol_round_pools(
    df: DataFrame,
    id_col: str,
    conf_col: str,
    k: int,
    n_rounds: int,
    seed_pred: Column,
) -> DataFrame:
    """rd_0..rd_N pool bookkeeping (main.py:37-52): returns
    ``(id_col, rd int)`` — the round at which each LABELED row entered
    the pool (rd=0 for the seed; rows never selected don't appear —
    they are the final round's unlabeled pool, recoverable by
    anti-join). Each round promotes the top-k by ``conf_col`` (DESC,
    id ASC ties — least-confidence order) from the anti-join
    remainder, composing `active_learning_round` N times.

    Scale: the labeled frame is ≤ seed+k·N rows and broadcasts into
    every anti-join; each round is one TakeOrdered over the remainder
    — no global sort, no growing lineage (the tiny labeled frame is
    lazily checkpointed per round).
    """
    if k < 1 or n_rounds < 0:
        raise ValueError(f"need k >= 1 and n_rounds >= 0, got {k}/{n_rounds}")
    base = df.select(F.col(id_col), F.col(conf_col))
    labeled = (
        base.where(seed_pred)
        .select(F.col(id_col), F.lit(0).alias("rd"))
        .localCheckpoint(eager=False)
    )
    for r in range(1, n_rounds + 1):
        pool = base.join(F.broadcast(labeled.select(id_col)), id_col, "left_anti")
        pick = (
            pool.orderBy(F.col(conf_col).desc(), F.col(id_col).asc())
            .limit(k)
            .select(F.col(id_col), F.lit(r).alias("rd"))
        )
        labeled = labeled.unionByName(pick).localCheckpoint(eager=False)
    return labeled
