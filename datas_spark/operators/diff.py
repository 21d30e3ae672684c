"""Snapshot diff: classify every key across two table versions as
added / removed / changed / unchanged — the audit primitive behind
pipeline regression checks ("what did this code change do to the
output corpus?") and CDC backfills.

Scale shape: one full-outer join on the key (the natural shuffle both
snapshots already partition on) with a null-safe column comparison.
Compare wide payloads by HASH (``compare_hash=True``) to keep the
shuffle narrow: each side then carries key + one 32-char digest
instead of the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    compare_hash: bool = True,
) -> DataFrame:
    """Per-key change classification between two snapshots:
    ``(key_cols..., change)`` with change in
    {'added', 'removed', 'changed', 'unchanged'}.

    NULL-safe: a NULL payload equals a NULL payload (each column is
    coalesced to a sentinel before the digest), so schema-stable
    nullable columns never misreport as changed.
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")

    def digest(df: DataFrame, name: str) -> DataFrame:
        payload = F.concat_ws(
            "",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("<<NULL>>"))
                for c in compare_cols
            ],
        )
        body = F.md5(payload) if compare_hash else payload
        return df.select(*key_cols, body.alias(name))

    o = digest(old, "__old")
    n = digest(new, "__new")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(F.col("__old") == F.col("__new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change"))
