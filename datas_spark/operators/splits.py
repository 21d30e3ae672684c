"""Leakage-safe dataset splitting — north-star training-pipeline
operators (SURVEY §2.9; the reference's pools are plain id-mod splits,
``main.py`` rd_N round bookkeeping).

The failure mode these exist for: a random per-ROW split leaks
near-duplicate pairs across train/test — the model sees the test set's
paraphrase at train time and the eval is contaminated. The fix is
standard (e.g. the C4/Pile dedup literature): split by GROUP, where a
group is a connected component of the near-dup graph, so every member
of a component lands in the same split.

Scale shape: component resolution is the engine's existing
``near_dedup_keep_first`` (banded pair generation + iterative
min-label CC — no all-pairs work); the split decision itself is one
map-side md5 expression on the component label. Nothing here adds a
shuffle beyond the CC itself.

Relationship to ``corpus.hash_split`` / ``corpus.group_split``: those
are the bare map-only assignment expressions (caller supplies the
group key). This module owns the end-to-end leakage-safe composition —
pair graph → components → salted integer-percent assignment — plus the
`split_leakage_counts` audit that proves the zero-cross property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datas_spark.operators.dedup import near_dedup_keep_first

__all__ = ["group_split_assign", "group_safe_split", "split_leakage_counts", "kfold_assign",
    "stratified_kfold_assign"]


def group_split_assign(
    group: F.Column,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> F.Column:
    """Deterministic split label ('train'/'val'/'test') from a group
    key: bucket = first 8 hex chars of md5(salt || group) mod 100 —
    portable across engines (the DuckDB twin is the same md5 prefix),
    stable across runs and cluster sizes, and uniform enough that the
    realized fractions converge to the targets as groups grow.

    Per-ROW hashing of the same expression would converge faster but
    leak correlated groups across splits; hashing the GROUP key is the
    point. ``salt`` re-deals the assignment without touching data."""
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct < 100):
        raise ValueError(
            f"need 0<train, 0<=val, train+val<100; got {train_pct}/{val_pct}"
        )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), group.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def group_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
    components: DataFrame | None = None,
) -> DataFrame:
    """Assign every row a train/val/test split such that no near-dup
    pair (an edge in ``pairs``) ever crosses a split boundary: rows
    are grouped into connected components of the pair graph and the
    whole component is hashed to one split. Singleton docs (no dup)
    form their own component, so they split independently.

    Appends ``component`` and ``split`` to ``df``. The guarantee is
    structural — both endpoints of any pair share a component, hence a
    split — not statistical; `split_leakage_counts` audits it.

    ``components`` injects precomputed ``(node, component)`` labels
    (the persisted artifact path); CC then never re-runs here."""
    resolved = near_dedup_keep_first(df, id_col, pairs, components=components)
    return resolved.drop("is_representative").withColumn(
        "split", group_split_assign(F.col("component"), train_pct, val_pct, salt)
    )


def split_leakage_counts(
    split_df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    split_col: str = "split",
) -> DataFrame:
    """Audit: of the near-dup pairs, how many have endpoints in
    different splits? Returns one row (n_pairs, cross_split_pairs) —
    cross_split_pairs MUST be 0 for a group-safe assignment; run it
    against a naive per-row split to quantify the leak it would ship.

    Two broadcast-friendly equi-joins on the id key (the pair frame is
    orders of magnitude smaller than the corpus); no shuffle of
    ``split_df`` beyond them."""
    a = split_df.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("__sa")
    )
    b = split_df.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("__sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count(F.when(F.col("__sa") != F.col("__sb"), 1))
            .cast("long")
            .alias("cross_split_pairs"),
        )
    )


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    group_col: str | None = None,
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: ``fold =
    hash60(md5(key)) mod k`` — a pure map-side expression, no RNG
    state, reproducible across runs and engines.

    ``group_col`` switches the key from the row id to a group label
    (e.g. the near-dup component from ``group_split_assign`` or a user
    id), putting every member of a group in the SAME fold — the
    leakage rule cross-validation needs for grouped data. NULL groups
    fall back to the row id (a rowless group must not glue all
    orphans together).
    """
    from datas_spark.functions.text import hash60

    key = F.col(group_col) if group_col else F.col(id_col)
    if group_col:
        key = F.coalesce(key.cast("string"), F.col(id_col).cast("string"))
    return df.withColumn(
        out_col, F.pmod(hash60(key.cast("string")), F.lit(int(k))).cast("int")
    )


def stratified_kfold_assign(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int = 5,
    out_col: str = "fold",
    num_partitions: int | None = None,
) -> DataFrame:
    """Stratified k-fold assignment: within every stratum (label), rows
    are ordered by ``md5(id)`` and dealt round-robin — each fold gets
    ``count/k`` of EVERY stratum to within one row, the guarantee plain
    hash-mod folds (`kfold_assign`) only give in expectation (a rare
    label's 20 rows can land 8/1/5/2/4 by hash; stratified deals
    4/4/4/4/4). Deterministic: same data → same folds, no RNG state.

    Scale shape: the per-stratum rank comes from
    ``selection.skew_resistant_rank`` — a label covering half the
    corpus never serializes onto one task the way a
    ``Window.partitionBy(label)`` would. One balanced range exchange,
    map-side modulo, done.
    """
    from datas_spark.operators.selection import skew_resistant_rank

    keyed = df.withColumn("__skey", F.md5(F.col(id_col).cast("string")))
    ranked = skew_resistant_rank(keyed, strata_col, "__skey", num_partitions)
    return ranked.withColumn(
        out_col, ((F.col("__rn") - 1) % F.lit(int(k))).cast("int")
    ).drop("__skey", "__rn", "__m")
