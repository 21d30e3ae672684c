"""Semantics tests for splits.py + registry_dedup (leakage-safe splits,
containment pairs, vocab growth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datas_spark.operators.dedup import ngram_containment_pairs, ngram_jaccard_pairs
from datas_spark.operators import splits as S
from datas_spark.operators.splits import (
    group_safe_split,
    group_split_assign,
    split_leakage_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_group_split_keeps_components_together(spark, sf_dir):
    from datas_spark.io.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    split = group_safe_split(docs, "doc_id", pairs)
    # every component maps to exactly one split label
    multi = (
        split.groupBy("component")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert multi == 0
    # and therefore zero cross-split pairs
    audit = split_leakage_counts(split, "doc_id", pairs).collect()[0]
    assert audit.cross_split_pairs == 0
    assert audit.n_pairs == pairs.count()


def test_group_split_fractions_roughly_match_targets(spark):
    # 2000 singleton docs: realized fractions converge on 80/10/10
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    empty_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    split = group_safe_split(df, "doc_id", empty_pairs)
    counts = {r.split: r.c for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert abs(counts["train"] / 2000 - 0.80) < 0.05
    assert abs(counts.get("val", 0) / 2000 - 0.10) < 0.03
    assert abs(counts.get("test", 0) / 2000 - 0.10) < 0.03


def test_group_split_is_salt_stable_and_redealable(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    s1 = {r.doc_id: r.split for r in group_safe_split(df, "doc_id", empty).collect()}
    s2 = {r.doc_id: r.split for r in group_safe_split(df, "doc_id", empty).collect()}
    assert s1 == s2  # deterministic
    s3 = {
        r.doc_id: r.split
        for r in group_safe_split(df, "doc_id", empty, salt="v2").collect()
    }
    assert s1 != s3  # a new salt re-deals


def test_group_split_assign_validates_percents(spark):
    with pytest.raises(ValueError):
        group_split_assign(F.lit(1), train_pct=90, val_pct=10)
    with pytest.raises(ValueError):
        group_split_assign(F.lit(1), train_pct=0)


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A 6-word doc quoted inside a 60-word doc: containment 1.0,
    Jaccard far below its threshold."""
    short = "the quick brown fox jumps high"
    long = short + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(18))
    docs = _docs(spark, [(1, short), (2, long), (3, "completely different text here")])
    cont = ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in cont] == [(1, 2)]
    assert cont[0].containment == pytest.approx(1.0)
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).collect()
    assert (1, 2) not in [(r.id_a, r.id_b) for r in jac]


def test_containment_matches_brute_force(spark, sf_dir):
    from datas_spark.io.sources import read_table

    docs = read_table(spark, sf_dir, "documents").limit(80)
    got = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    rows = docs.select("doc_id", "text").collect()

    def grams(t):
        toks = t.strip().split()
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}

    gs = {r.doc_id: grams(r.text) for r in rows}
    expect = {}
    ids = sorted(gs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not gs[a] or not gs[b]:
                continue
            c = len(gs[a] & gs[b]) / min(len(gs[a]), len(gs[b]))
            if c >= 0.5:
                expect[(a, b)] = c
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v)


def test_vocab_growth_is_monotone_and_ends_at_totals(spark, sf_dir):
    from datas_spark.registry_dedup import q_vocab_growth_curve
    from datas_spark.io.sources import read_table
    from datas_spark.functions.text import word_tokens

    rows = q_vocab_growth_curve(spark, sf_dir).orderBy("bucket").collect()
    assert rows
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_vocab >= prev.cum_vocab
        assert cur.cum_tokens > prev.cum_tokens
        assert cur.cum_vocab == prev.cum_vocab + cur.new_terms
    docs = read_table(spark, sf_dir, "documents")
    total_vocab = (
        docs.select(F.explode(word_tokens("text")).alias("t"))
        .select(F.lower("t").alias("t"))
        .distinct()
        .count()
    )
    total_tokens = docs.select(
        F.sum(F.size(word_tokens("text"))).alias("n")
    ).collect()[0].n
    assert rows[-1].cum_vocab == total_vocab
    assert rows[-1].cum_tokens == total_tokens


def test_kfold_assign_deterministic_and_in_range(spark):
    df = spark.createDataFrame([(i, f"g{i % 3}") for i in range(60)], ["id", "g"])
    a = {r.id: r.fold for r in S.kfold_assign(df, "id", k=5).collect()}
    b = {r.id: r.fold for r in S.kfold_assign(df, "id", k=5).collect()}
    assert a == b
    assert set(a.values()) <= set(range(5))
    # every fold populated at n=60 (md5 is uniform)
    assert len(set(a.values())) == 5


def test_kfold_assign_grouped_keeps_groups_together(spark):
    df = spark.createDataFrame([(i, f"g{i % 3}") for i in range(30)], ["id", "g"])
    out = S.kfold_assign(df, "id", k=4, group_col="g").collect()
    folds = {}
    for r in out:
        folds.setdefault(r.g, set()).add(r.fold)
    assert all(len(v) == 1 for v in folds.values())


def test_kfold_assign_null_group_falls_back_to_id(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id int, g string")
    out = {r.id: r.fold for r in S.kfold_assign(df, "id", k=97, group_col="g").collect()}
    # distinct ids → (almost surely) distinct folds, NOT one glued group
    assert out[1] != out[2]


def test_stratified_kfold_balance_and_determinism(spark):
    from datas_spark.operators.splits import stratified_kfold_assign

    rows = [(i, "a" if i < 23 else "b") for i in range(40)]  # 23 a / 17 b
    df = spark.createDataFrame(rows, "id long, lab string")
    got = stratified_kfold_assign(df, "id", "lab", k=5, num_partitions=3)
    counts = {
        (r.lab, r.fold): r["count"]
        for r in got.groupBy("lab", "fold").count().collect()
    }
    # every stratum deals count/k per fold to within ONE row
    for lab, n in (("a", 23), ("b", 17)):
        per = [counts.get((lab, f), 0) for f in range(5)]
        assert sum(per) == n and max(per) - min(per) <= 1
    # deterministic across invocations
    a = sorted((r.id, r.fold) for r in got.collect())
    b = sorted(
        (r.id, r.fold)
        for r in stratified_kfold_assign(df, "id", "lab", k=5, num_partitions=3).collect()
    )
    assert a == b
