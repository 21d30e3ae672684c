"""Declarative data-quality expectations — the validation gate a 100 TB
ingestion pipeline runs before anything expensive (extends the
reference's structural format check, ``src/pipeline/base.py:28``, into
content rules).

One pass, one row out per rule: every rule is a Column predicate, all
rules evaluate inside a SINGLE aggregate over one scan — no per-rule
job, no collect of violating rows (at scale you count first, sample
violators separately if a gate fails).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect"]


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations; return one row per rule:
    ``(rule, violations, total, pass)``. A NULL predicate result counts
    as a violation (unknown is not acceptable), matching SQL
    ``count(*) FILTER (WHERE NOT coalesce(cond, false))``.

    All rules fold into one aggregate → one scan, map-side combined;
    the unpivot to long form happens on the single 1-row result.
    """
    if not rules:
        raise ValueError("expect() needs at least one rule")
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(f"__v_{i}")
        for i, (_, cond) in enumerate(rules.items())
    ]
    row = df.agg(*aggs, F.count(F.lit(1)).alias("__total"))
    names = list(rules)
    stacked = row.select(
        F.stack(
            F.lit(len(names)),
            *[
                x
                for i, n in enumerate(names)
                for x in (F.lit(n), F.col(f"__v_{i}"))
            ],
        ).alias("rule", "violations"),
        F.col("__total").alias("total"),
    )
    return stacked.withColumn(
        "pass", (F.col("violations") == 0).cast("int")
    )
