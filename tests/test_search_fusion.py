"""Semantics tests for registry_search: reciprocal-rank fusion and G²
keyness — checked against driver-side recomputation from the component
rankings / raw counts, independent of the SQL oracles.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.search import rrf_fuse
from datas_spark.registry_search import (
    _RRF_K0,
    q_hybrid_search_rrf,
    q_source_keyness_terms,
)


def test_rrf_fuse_matches_manual_reciprocal_sum(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
    )
    sem = spark.createDataFrame(
        [(12, 1), (13, 2), (10, 3)], ["doc_id", "rank"]
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, sem], "doc_id", k0=60).collect()}
    # doc 12: rank 3 lexical + rank 1 semantic; doc 13 semantic-only
    assert out[12].n_lists == 2 and out[13].n_lists == 1
    assert out[12].rrf_score == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
    assert out[13].rrf_score == pytest.approx(1 / 62, abs=1e-6)
    # docs 10 and 12 tie exactly (1/61 + 1/63 each) — the id tie-break
    # must put 10 first, deterministically
    ordered = sorted(out.values(), key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.doc_id for r in ordered[:2]] == [10, 12]


def test_rrf_rejects_empty_input(spark):
    with pytest.raises(ValueError):
        rrf_fuse([], "doc_id")


def test_hybrid_query_scores_decompose_into_component_ranks(spark, sf_dir):
    """Every fused score must equal the reciprocal-rank sum implied by
    n_lists: docs in both lists get two terms, single-list docs one."""
    rows = q_hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.n_lists in (1, 2)
        # any RRF score is a sum of n_lists terms, each ≤ 1/(k0+1)
        assert 0 < r.rrf_score <= r.n_lists / (_RRF_K0 + 1) + 1e-9
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_keyness_terms_are_overrepresented(spark, sf_dir):
    """Each reported term's in-source rate must exceed its corpus rate
    (the overrepresentation filter), G² must be positive, and no source
    reports more than the configured top-k."""
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_source = Counter()
    term_source = Counter()
    term_tot = Counter()
    for row in docs:
        for w in row.text.strip().split():
            t = w.lower()
            if t:
                per_source[row.source] += 1
                term_source[(row.source, t)] += 1
                term_tot[t] += 1
    n = sum(per_source.values())
    out = q_source_keyness_terms(spark, sf_dir).collect()
    by_source = defaultdict(list)
    for r in out:
        by_source[r.source].append(r)
        assert r.g2 > 0
        a = term_source[(r.source, r.term)]
        assert a == r.cnt
        assert a * n > per_source[r.source] * term_tot[r.term]
    for src, rows in by_source.items():
        assert len(rows) <= 5
        g2s = [r.g2 for r in rows]
        assert g2s == sorted(g2s, reverse=True)


def test_random_projection_deterministic_and_jl_shaped(spark):
    from datas_spark.operators.similarity import random_projection
    import hashlib, math

    rows = [(i, [float((i * 7 + d) % 5) - 2.0 for d in range(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.rp for r in random_projection(df, "embedding", 8, 4).collect()}
    # hand-compute row 3 against the same md5 sign rule
    signs = [
        [1.0 if int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[:15], 16) % 2 == 0
         else -1.0 for i in range(8)]
        for j in range(4)
    ]
    vec = rows[3][1]
    want = [round(sum(x * s for x, s in zip(vec, signs[j])) / math.sqrt(4.0), 6)
            for j in range(4)]
    assert [round(v, 5) for v in out[3]] == [round(w, 5) for w in want]
    # deterministic across layouts
    again = {r.vec_id: r.rp
             for r in random_projection(df.repartition(5), "embedding", 8, 4).collect()}
    assert again == out
