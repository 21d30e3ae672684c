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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["expect", "quarantine", "k_anonymity", "l_diversity", "suggest_constraints", "dp_release_audit"]


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


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Route rows by the same named expectations `expect` counts:
    returns ``(good, bad)`` where ``bad`` carries ``failed_rules`` (the
    sorted array of rule names the row violated — a NULL predicate is a
    violation, as in `expect`). The ingestion-time quality gate that
    keeps the pipeline running while defective rows land in a
    quarantine table with their reasons attached.

    Both frames derive from ONE map-side expression (no join, no second
    scan); callers typically write ``bad`` to a partitioned quarantine
    path and continue with ``good``.
    """
    if not rules:
        raise ValueError("quarantine() needs at least one rule")
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                    for name, cond in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    good = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.where(F.size("failed_rules") > 0)
    return good, bad


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Privacy audit: how identifiable are rows by their
    quasi-identifier combination? One row out:
    ``(k_required, min_group_size, n_groups, n_rows, rows_at_risk,
    at_risk_pct)`` where ``rows_at_risk`` counts rows whose
    quasi-identifier group has fewer than ``k`` members — the rows a
    k-anonymity release contract would require generalizing or
    suppressing. The screen to run before shipping any
    user-attributable slice into a training corpus.

    One grouped count over the quasi columns (combinable), one tiny
    re-aggregate over the ≤|groups| frame; NULLs group together
    (SQL GROUP BY semantics), which is the conservative reading — an
    all-NULL quasi tuple is still a (large) group.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity() needs at least one quasi column")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return groups.agg(
        F.lit(k).cast("long").alias("k_required"),
        F.min("__n").cast("long").alias("min_group_size"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0)).cast("double")
            / F.sum("__n").cast("double")
            * 100,
            6,
        ).alias("at_risk_pct"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Privacy audit one step past k-anonymity: a quasi-identifier
    group is l-diverse when it contains at least ``l`` DISTINCT values
    of the sensitive attribute — a group of 50 rows that all share one
    diagnosis is 50-anonymous yet fully disclosing. One row out:
    ``(l_required, min_distinct, n_groups, groups_below, n_rows,
    rows_at_risk, at_risk_pct)``.

    One grouped aggregate over the quasi columns carrying BOTH the
    row count and the distinct-sensitive count (count_distinct is the
    only non-map-side-combinable piece — swap approx_count_distinct at
    extreme scale), then a tiny re-aggregate. NULL sensitive values
    count as one shared value (conservative: NULL is itself a
    disclosure class).
    """
    if not quasi_cols:
        raise ValueError("l_diversity() needs at least one quasi column")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        (
            F.count_distinct(F.col(sensitive_col))
            + F.max(F.col(sensitive_col).isNull().cast("int"))
        ).alias("__d"),
    )
    return groups.agg(
        F.lit(l).cast("long").alias("l_required"),
        F.min("__d").cast("long").alias("min_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count_if(F.col("__d") < l).cast("long").alias("groups_below"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__d") < l, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("__d") < l, F.col("__n")).otherwise(0))
            / F.sum("__n")
            * 100,
            6,
        ).alias("at_risk_pct"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    bucket_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """The third rung of the privacy-audit ladder (k-anonymity →
    l-diversity → t-closeness): a quasi-identifier group leaks when the
    DISTRIBUTION of the (ordinal, pre-bucketed) sensitive attribute
    inside it sits far from the global distribution — a group that is
    both large and diverse still discloses if 90% of it lands in the
    top-wealth band. Distance is the ordered-bucket Earth Mover's
    Distance with unit spacing, EMD = Σ|cumQ − cumP| / (m−1); a group
    is at risk when EMD > t (``t_num/t_den``).

    Everything stays exact-integer until the report: per-(group,
    bucket) BIGINT counts on a full group×bucket grid, cumulative sums
    by bucket order, and the risk test cross-multiplied —
    ``Σ|cumq·N − cump·n_g| · t_den > t_num · n_g · N · (m−1)`` — so the
    threshold comparison never touches a float. (Products reach
    n_g·N ≈ 10¹⁸ around a billion rows per side; move the two cum
    columns to DECIMAL(38,0) past that.) All frames after the first
    grouped count are aggregate-sized; the grid is groups × m buckets.

    One row out: ``(t_required, max_emd, n_groups, groups_above,
    n_rows, rows_at_risk, at_risk_pct)``.
    """
    if not quasi_cols:
        raise ValueError("t_closeness() needs at least one quasi column")
    if t_num <= 0 or t_den <= 0:
        raise ValueError("t must be a positive fraction")
    q = [F.col(c) for c in quasi_cols]
    cell = df.groupBy(*q, F.col(bucket_col).alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    gt = cell.groupBy(*quasi_cols).agg(F.sum("__c").cast("long").alias("__ng"))
    bt = cell.groupBy("__b").agg(F.sum("__c").cast("long").alias("__pc"))
    tot = bt.agg(
        F.sum("__pc").cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__m"),
    )
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bt.withColumn("__cump", F.sum("__pc").over(wb).cast("long")).select(
        "__b", "__cump"
    )
    grid = gt.crossJoin(F.broadcast(bcum)).join(
        cell, [*quasi_cols, "__b"], "left"
    ).withColumn("__c", F.coalesce(F.col("__c"), F.lit(0).cast("long")))
    wg = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = grid.withColumn("__cumq", F.sum("__c").over(wg).cast("long")).crossJoin(
        F.broadcast(tot)
    )
    num = F.abs(F.col("__cumq") * F.col("__N") - F.col("__cump") * F.col("__ng"))
    per_group = terms.groupBy(*quasi_cols).agg(
        F.sum(num).cast("long").alias("__S"),
        F.max("__ng").alias("__ng"),
        F.max("__N").alias("__N"),
        F.max("__m").alias("__m"),
    )
    at_risk = (
        F.col("__S") * F.lit(t_den)
        > F.lit(t_num) * F.col("__ng") * F.col("__N") * (F.col("__m") - 1)
    ) & (F.col("__m") > 1)
    emd = F.when(
        F.col("__m") > 1,
        F.col("__S")
        / (F.col("__ng") * F.col("__N") * (F.col("__m") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return per_group.agg(
        F.round(F.lit(t_num) / F.lit(t_den), 6).alias("t_required"),
        F.round(F.max(emd), 6).alias("max_emd"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count_if(at_risk).cast("long").alias("groups_above"),
        F.sum("__ng").cast("long").alias("n_rows"),
        F.sum(F.when(at_risk, F.col("__ng")).otherwise(0)).cast("long").alias(
            "rows_at_risk"
        ),
        F.round(
            F.sum(F.when(at_risk, F.col("__ng")).otherwise(0)) / F.sum("__ng") * 100,
            6,
        ).alias("at_risk_pct"),
    )


def suggest_constraints(
    df: DataFrame,
    cols: list[str],
    isin_cols: list[str] | None = None,
    isin_max: int = 25,
) -> DataFrame:
    """Constraint SUGGESTION (the Deequ/`expect` authoring loop run in
    reverse): profile each column in ONE wide aggregate and emit the
    rules the data currently satisfies — ``not_null`` when no NULLs,
    ``unique`` when every non-NULL value is distinct, ``range[lo,hi]``
    for numeric columns, ``isin[v1,...]`` for DECLARED low-cardinality
    columns under ``isin_max`` distinct values. One row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, rules)`` with ``rules`` a
    deterministic '; '-joined string, ready to be reviewed and frozen
    into an `expect` gate.

    ``isin_cols`` is an explicit declaration, not an inference: a
    value-set suggestion needs ``collect_set``, which is unbounded on a
    high-cardinality column — at 100 TB you never collect the distinct
    set of an id column to decide it isn't categorical. Everything
    else (counts, distinct counts, min/max) is a single scan;
    ``count_distinct`` over several columns expands the aggregate
    (one Expand pass), still one shuffle.
    """
    isin_cols = isin_cols or []
    unknown = set(isin_cols) - set(cols)
    if unknown:
        raise ValueError(f"isin_cols not in cols: {sorted(unknown)}")
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    for c in isin_cols:
        aggs.append(
            F.array_join(
                F.array_sort(F.collect_set(F.col(c).cast("string"))), ","
            ).alias(f"__set_{c}")
        )
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        nn, nd = F.col(f"__nn_{c}"), F.col(f"__nd_{c}")
        parts = [
            F.when(F.col("__n") == nn, F.lit("not_null")),
            F.when((nd == nn) & (nn > 0), F.lit("unique")),
        ]
        if c in isin_cols:
            parts.append(
                F.when(
                    nd <= F.lit(isin_max),
                    F.concat(F.lit("isin["), F.col(f"__set_{c}"), F.lit("]")),
                )
            )
        if c in numeric:
            parts.append(
                F.when(
                    nn > 0,
                    F.concat(
                        F.lit("range["),
                        F.col(f"__min_{c}"),
                        F.lit(","),
                        F.col(f"__max_{c}"),
                        F.lit("]"),
                    ),
                )
            )
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - nn).alias("n_nulls"),
                nd.alias("n_distinct"),
                F.array_join(
                    F.filter(F.array(*parts), lambda x: x.isNotNull()), "; "
                ).alias("rules"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("__s")).select("__s.*")


def dp_release_audit(
    df: DataFrame,
    key_col: str,
    epsilon: float = 1.0,
    seed: str = "dp1",
) -> DataFrame:
    """Differentially-private histogram release what-if (Dwork et al.
    2006, the Laplace mechanism) — the release-side companion of the
    privacy AUDITS (`k_anonymity`/`l_diversity`/`t_closeness` measure
    a table's risk; this prices what publishing its histogram under
    ε-DP would cost in accuracy): per key,

        released = max(round(count + Lap(Δf/ε)), 0),   Δf = 1

    with the Laplace draw inverse-CDF'd from a DETERMINISTIC md5
    uniform, u = (int(md5(seed:key)[:8]) + 0.5) / 2³²:

        noise = −(1/ε) · sgn(u − ½) · ln(1 − 2·|u − ½|)

    Determinism is the point of the what-if: the SAME noise lands on
    any cluster size, any partition layout, any engine, so the
    accuracy audit is oracle-checkable (a production release would
    swap the md5 uniform for a real CSPRNG — one expression — and
    everything else, including the ε accounting, is unchanged).
    NOTE: a real release publishes ONLY ``key``/``n_released``; the
    true count and noise columns exist because this is the pricing
    audit.

    Scale shape: ONE combinable count aggregate; noise is a map-side
    expression over the |keys|-row frame. Noise is rounded to 6 dp
    (the engine's ln last-ulp resync). Returns ``(key, n_true,
    epsilon, noise, n_released, abs_err)``.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("key").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = F.round(
        F.lit(-1.0 / float(epsilon))
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))),
        6,
    )
    released = F.greatest(
        F.round(F.col("n_true") + noise).cast("long"), F.lit(0).cast("long")
    )
    return counts.select(
        "key",
        "n_true",
        F.lit(float(epsilon)).alias("epsilon"),
        noise.alias("noise"),
        released.alias("n_released"),
        F.abs(released - F.col("n_true")).cast("long").alias("abs_err"),
    )
