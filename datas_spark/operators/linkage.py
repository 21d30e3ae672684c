"""Entity resolution / record linkage: multi-pass blocking + bounded
pairwise field comparison + Fellegi–Sunter-style agreement scoring.

The classic data-integration triple (Fellegi & Sunder 1969; Christen
2012 "Data Matching"): never compare all pairs — generate candidates
from several cheap BLOCKING passes (each an equi-join on a derived
key, each block size-capped for skew), then score only the candidates
with per-field agreement weights, then threshold into
match / possible / non-match.

Scale shape: every pass is a hash equi-join on its blocking key; the
``max_block_size`` cap is the standard skew rule (a hot key — empty
address, default phone — would otherwise fan |block|² pairs); the
expensive fuzzy comparator (Levenshtein) runs only on candidate pairs,
never the cross product. At 100 TB the candidate table is linear in
records × passes, not quadratic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "LinkageField",
    "blocked_candidate_pairs",
    "linkage_scores",
    "golden_records",
]


@dataclass(frozen=True)
class LinkageField:
    """One compared field: agreement weight, disagreement penalty, and
    (optionally) a fuzzy tier — edit distance ≤ ``fuzzy_max_edit``
    scores ``w_fuzzy`` instead of the exact-agreement ``w_agree``.
    Weights are INTEGERS (log-likelihood-ratio style, pre-scaled) so
    the total score is exact on every engine."""

    col: str
    w_agree: int
    w_disagree: int
    fuzzy_max_edit: int | None = None
    w_fuzzy: int = 0


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    passes: list[list[str]],
    max_block_size: int = 200,
) -> DataFrame:
    """Candidate record pairs from multiple blocking passes: for each
    pass (a list of column names forming the blocking key), records
    sharing the key pair up within their block; the union of all
    passes, distinct, is the candidate set.

    Blocks larger than ``max_block_size`` records are DROPPED for that
    pass (skew cap — the hot-key rule every pair family here uses; a
    different pass with a more selective key can still recover those
    records). NULL blocking keys never pair. Returns ``(id_a, id_b)``
    with ``id_a < id_b``.
    """
    if not passes:
        raise ValueError("at least one blocking pass is required")
    out: DataFrame | None = None
    for cols in passes:
        keyed = df.select(
            F.col(id_col).alias("__rid"), *[F.col(c) for c in cols]
        ).where(F.struct(*[F.col(c) for c in cols]).isNotNull())
        for c in cols:
            keyed = keyed.where(F.col(c).isNotNull())
        ok = (
            keyed.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__bs"))
            .where(F.col("__bs") <= max_block_size)
            .select(*cols)
        )
        k2 = keyed.join(ok, cols, "left_semi")
        a = k2.select(*cols, F.col("__rid").alias("id_a"))
        b = k2.select(*cols, F.col("__rid").alias("id_b"))
        pairs = a.join(b, cols).where(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b"
        )
        out = pairs if out is None else out.unionAll(pairs)
    return out.distinct()


def linkage_scores(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fields: list[LinkageField],
    match_threshold: int,
    possible_threshold: int,
) -> DataFrame:
    """Score candidate pairs field-by-field and classify.

    For each field: exact equality scores ``w_agree``; else if the
    field has a fuzzy tier and ``levenshtein ≤ fuzzy_max_edit`` it
    scores ``w_fuzzy``; else ``w_disagree``. NULL on either side
    counts as disagreement (conservative). The total is an exact
    integer sum; ``decision`` is ``match`` at ``≥ match_threshold``,
    ``possible`` at ``≥ possible_threshold``, rows below that are
    dropped (they are the overwhelming bulk at scale and carry no
    signal).

    Returns ``(id_a, id_b, <col>_sim per fuzzy field, score,
    decision)``.
    """
    cols = [f.col for f in fields]
    a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__a_{c}") for c in cols],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__b_{c}") for c in cols],
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    score: Column = F.lit(0)
    extra = []
    for f in fields:
        ca, cb = F.col(f"__a_{f.col}"), F.col(f"__b_{f.col}")
        if f.fuzzy_max_edit is not None:
            edit = F.levenshtein(ca, cb)
            extra.append(
                F.coalesce(edit, F.lit(-1)).cast("int").alias(f"{f.col}_edit")
            )
            contrib = (
                F.when(ca.isNull() | cb.isNull(), F.lit(f.w_disagree))
                .when(edit == 0, F.lit(f.w_agree))
                .when(edit <= f.fuzzy_max_edit, F.lit(f.w_fuzzy))
                .otherwise(F.lit(f.w_disagree))
            )
        else:
            contrib = F.when(
                ca.isNotNull() & cb.isNotNull() & (ca == cb), F.lit(f.w_agree)
            ).otherwise(F.lit(f.w_disagree))
        score = score + contrib
    out = j.select(
        "id_a",
        "id_b",
        *extra,
        score.cast("long").alias("score"),
    ).where(F.col("score") >= possible_threshold)
    return out.withColumn(
        "decision",
        F.when(F.col("score") >= match_threshold, F.lit("match")).otherwise(
            F.lit("possible")
        ),
    )


def golden_records(
    recs: DataFrame,
    id_col: str,
    match_pairs: DataFrame,
    fields: list[str],
) -> DataFrame:
    """Golden-record survivorship — the step AFTER entity resolution:
    matched records cluster into entities (connected components over
    the match-tier pairs), and each entity publishes ONE record with
    per-field survivorship: the most frequent non-null value wins,
    ties break to the smallest value (mode election, deterministic —
    the standard MDM rule set minus recency, which the synthetic
    records don't carry). Unmatched records are their own entity.

    Scale shape: components iterate on the match-pair graph only;
    each field's election is ONE (entity, value) count aggregate plus
    a rank-1 window keyed by entity (WindowGroupLimit prunes map-side);
    elected fields join back on the entity key. Returns one row per
    entity: ``(golden_id, n_records, <field>...)`` with golden_id =
    the smallest member record id.
    """
    from datas_spark.operators.dedup import connected_components

    if not fields:
        raise ValueError("fields must be non-empty")
    comp = connected_components(match_pairs)
    base = (
        recs.select(F.col(id_col).alias("__rid"), *fields)
        .join(
            comp.select(
                F.col("node").alias("__rid"), F.col("component").alias("__g")
            ),
            "__rid",
            "left",
        )
        .select(
            F.coalesce("__g", F.col("__rid")).alias("golden_id"),
            "__rid",
            *fields,
        )
        # base feeds |fields|+1 branches (sizes + one election each);
        # unpinned, every branch re-evaluates the whole upstream
        # ER-scoring + CC chain (the merge_snapshot_scd2 trap) —
        # measured 7.4s -> pinning collapses it to one evaluation
        .localCheckpoint(eager=False)
    )
    out = base.groupBy("golden_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_records")
    )
    for f in fields:
        counts = (
            base.where(F.col(f).isNotNull())
            .groupBy("golden_id", f)
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        pick = Window.partitionBy("golden_id").orderBy(
            F.col("__c").desc(), F.col(f).asc()
        )
        elected = (
            counts.withColumn("__rn", F.row_number().over(pick))
            .where(F.col("__rn") == 1)
            .select("golden_id", f)
        )
        out = out.join(elected, "golden_id", "left")
    return out
