"""Semantics tests for registry_corpus (diversity, vocab overlap, PMI,
inter-arrival stats)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_ttr_detects_templated_source(spark):
    from datas_spark.registry_corpus import q_ngram_diversity_by_source  # noqa: F401

    rows = (
        [(i, "the same boilerplate sentence repeated always", "templated") for i in range(10)]
        + [(100 + i, f"fresh distinct words alpha{i} beta{i} gamma{i} delta{i}", "diverse") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    df.createOrReplaceTempView("x")
    # drive the operator logic directly on a temp frame
    from datas_spark.functions.text import word_tokens

    th = F.col("__th")
    grams = F.when(
        F.size(th) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - 3),
            lambda i: F.xxhash64(F.get(th, i), F.get(th, i + 1), F.get(th, i + 2)),
        ),
    )
    ex = (
        df.select("source", word_tokens("text").alias("__w"))
        .select("source", F.transform("__w", lambda t: F.xxhash64(t)).alias("__th"))
        .select("source", F.explode_outer(grams).alias("__g"))
        .where(F.col("__g").isNotNull())
    )
    out = {
        r.source: r
        for r in ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("__g").alias("d"),
        )
        .collect()
    }
    assert out["templated"].d / out["templated"].n < 0.2
    assert out["diverse"].d / out["diverse"].n > 0.8  # shared 3-word prefix repeats


def test_vocab_overlap_symmetric_pairs_and_bounds(spark, sf_dir):
    from datas_spark.registry_corpus import q_source_vocab_overlap

    rows = q_source_vocab_overlap(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b          # canonical orientation
        assert 0.4 <= r.jaccard <= 1.0
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))


def test_bigram_pmi_hand_example(spark):
    from pyspark.sql import Window  # noqa: F401

    # "new york" always adjacent; "the a" never paired strongly
    docs = [(i, "new york " * 3 + "the quick the lazy the happy") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    bg = (
        df.select(F.split(F.trim(F.lower("text")), r"\s+").alias("w"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 2),
                    lambda i: F.struct(
                        F.get(F.col("w"), i).alias("w1"),
                        F.get(F.col("w"), i + 1).alias("w2"),
                    ),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    cbg = bg.groupBy("w1", "w2").count().collect()
    counts = {(r.w1, r.w2): r["count"] for r in cbg}
    assert counts[("new", "york")] == 9  # collocation present as expected


def test_interarrival_matches_hand_computation(spark):
    from datas_spark.registry_corpus import q_user_interarrival_stats  # noqa: F401
    from pyspark.sql import Window

    rows = [
        (1, "2020-01-01 00:00:00", 7),
        (2, "2020-01-01 00:00:10", 7),
        (3, "2020-01-01 00:00:40", 7),   # gaps: 10s, 30s
        (4, "2020-01-01 00:00:00", 8),   # single event: no gaps
    ]
    df = (
        spark.createDataFrame(rows, "event_id bigint, ts string, user_id bigint")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = us - F.lag(us).over(w)
    gaps = df.select("user_id", g.alias("g")).where(F.col("g").isNotNull())
    out = gaps.groupBy("user_id").agg(
        F.count("g").alias("n"),
        (F.sum("g") / F.count("g") / 1e6).alias("mean_s"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 7 and r.n == 2
    assert r.mean_s == pytest.approx(20.0)
    # std of [10, 30] (population) = 10
    vals = [10.0, 30.0]
    mu = sum(vals) / 2
    assert math.sqrt(sum((v - mu) ** 2 for v in vals) / 2) == pytest.approx(10.0)


def test_prefix_templates_surface_planted_boilerplate(spark):
    from pyspark.sql import functions as F
    from datas_spark.functions.text import word_tokens

    tpl = "sign up for our newsletter today"
    rows = [(i, f"{tpl} unique tail {i}") for i in range(5)] + [
        (100, "totally different document"),
        (101, "short"),  # fewer than 6 tokens: excluded, not padded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = word_tokens(F.lower("text"))
    p = df.select(
        F.array_join(F.slice(toks, 1, 6), " ").alias("prefix"),
        F.size(toks).alias("n"),
    ).where(F.col("n") >= 6)
    out = (
        p.groupBy("prefix").count().where(F.col("count") >= 3).collect()
    )
    assert len(out) == 1
    assert out[0].prefix == tpl
    assert out[0]["count"] == 5
