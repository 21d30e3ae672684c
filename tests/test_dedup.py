"""Dedup operator tests on small in-memory frames."""

import pytest

from pyspark.sql import functions as F

from datas_spark.operators import dedup as D


def test_exact_dedup_normalizes(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),      # same after normalization
            (3, "something else"),
        ],
        "id long, text string",
    )
    got = sorted(r.id for r in D.exact_dedup(df, "text", "id").collect())
    assert got == [1, 3]  # keeps first by id


def test_minhash_identical_docs_share_signature(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, t), (2, t), (3, "completely different words here today")],
                               "id long, text string")
    sigs = {r.id: tuple(r.minhash) for r in D.minhash_signature(df, "text").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_minhash_lsh_pairs_finds_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"   # high shingle overlap
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "id long, text string")
    pairs = D.minhash_lsh_pairs(df, "id", "text", min_est_jaccard=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_minhash_lsh_pairs_excludes_empty_shingle_docs(spark):
    # docs shorter than shingle_n words have no shingles; the all-
    # sentinel signature must NOT band them into one shared bucket
    df = spark.createDataFrame(
        [(1, "hi"), (2, "yo"), (3, "ok"), (4, "a b c d e f g h"), (5, "a b c d e f g z")],
        "id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(df, "id", "text").collect()}
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)
    assert (4, 5) in pairs  # real near-dups still pair


def test_minhash_lsh_pairs_bucket_cap(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame([(i, t) for i in range(6)], "id long, text string")
    # 6 identical docs share every bucket; cap below 6 suppresses all pairs
    assert D.minhash_lsh_pairs(df, "id", "text", max_bucket_size=5).count() == 0
    assert D.minhash_lsh_pairs(df, "id", "text").count() == 15


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f"), (3, "x y z w q")],
        "id long, text string",
    )
    pairs = D.ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.1).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # shingles(1) = {abc,bcd,cde} (3), shingles(2) = + {def} (4); shared 3, union 4
    assert (p.id_a, p.id_b) == (1, 2)
    assert abs(p.jaccard - 0.75) < 1e-9


def test_simhash_near_dup_low_hamming(spark):
    a = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, a), (2, a + " today"), (3, "totally unrelated content about spark sql")],
        "id long, text string",
    )
    rows = {r.id: r.simhash for r in D.simhash(df, "text").collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(rows[1], rows[2]) < ham(rows[1], rows[3])


def test_embedding_near_dup_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.999, 0.01], "a"),
            (3, [0.0, 1.0], "a"),
            (4, [1.0, 0.0], "b"),  # identical to 1 but different block → excluded
        ],
        "id long, v array<double>, blk string",
    )
    pairs = D.embedding_near_dup_pairs(df, "id", "v", "blk", threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_embedding_near_dup_vectorized_matches_expression_path(spark):
    import pytest

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.999, 0.01], "a"),
            (3, [0.0, 1.0], "a"),
            (4, [1.0, 0.0], "b"),
            (5, [0.0, 0.0], "a"),  # zero-norm: undefined cosine, never pairs
        ],
        "id long, v array<double>, blk string",
    )
    expr = D.embedding_near_dup_pairs(df, "id", "v", "blk", threshold=0.0)
    expr = {(r.id_a, r.id_b, round(r.cos, 6)) for r in expr.collect()}
    vec = D.embedding_near_dup_pairs_vectorized(df, "id", "v", "blk", threshold=0.0)
    vec = {(r.id_a, r.id_b, r.cos) for r in vec.collect()}
    assert vec == expr
    assert not any(5 in (a, b) for a, b, _ in vec)
    with pytest.raises(Exception, match="max_block_rows"):
        D.embedding_near_dup_pairs_vectorized(
            df, "id", "v", "blk", max_block_rows=2
        ).collect()


def test_connected_components_chain_and_islands(spark):
    # 1-2-3 chained (transitive), 7-8 separate, 9 isolated (absent)
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 8)], "id_a long, id_b long"
    )
    comp = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id, matching both Spark algorithms
    return {n: find(n) for n in parent}


@pytest.mark.slow
def test_cc_block_local_matches_iterative_adversarial_blocks(spark):
    """The block-local CC fold (semdedup's capped path) must label
    exactly like the iterative operator on every block shape —
    including a full-diameter chain (worst case for the fixed
    ``size(nodes)-1`` round unroll), a clique, singleton-edge blocks,
    and random graphs — because the semantic-dedup oracle replays the
    min-id component recursion."""
    import random

    from datas_spark.operators.dedup import (
        _cc_block_local,
        connected_components,
    )

    rng = random.Random(7)
    rows = []
    for blk in range(12):
        n = rng.randint(2, 40)
        s = sorted(rng.sample(range(blk * 1000, blk * 1000 + 500), n))
        style = ("chain", "clique", "sparse", "random")[blk % 4]
        if style == "chain":  # diameter n-1: needs every unrolled round
            es = [(s[i], s[i + 1]) for i in range(n - 1)]
        elif style == "clique":
            es = [(a, b) for i, a in enumerate(s) for b in s[i + 1 :]][:200]
        elif style == "sparse":
            es = [(s[0], s[1])]
        else:
            es = sorted(
                {tuple(sorted(rng.sample(s, 2))) for _ in range(n)}
            )
        rows += [(blk % 3, blk, a, b) for a, b in es]
    df = spark.createDataFrame(rows, "c int, b int, id_a long, id_b long")
    got = {
        r.node: r.component
        for r in _cc_block_local(df, "id_a", "id_b", ["c", "b"]).collect()
    }
    want = {
        r.node: r.component
        for r in connected_components(
            df.select("id_a", "id_b"), max_iter=100
        ).collect()
    }
    assert got == want


@pytest.mark.slow
def test_connected_components_star_matches_union_find_random_graphs(spark):
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n = 40
        edges = list(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randrange(10, 60))
            }
        )
        expected = _union_find_labels(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.node: r.component
            for r in D.connected_components(pairs, algorithm="star").collect()
        }
        assert got == expected, f"seed {seed}"


def test_connected_components_star_high_diameter_chain(spark):
    # a 24-node chain: min-label needs ~23 rounds, star needs O(log^2)
    edges = [(i, i + 1) for i in range(23)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in D.connected_components(pairs, algorithm="star", max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(24)}


def test_connected_components_min_label_warns_on_max_iter(spark):
    import pytest

    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)], "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="without\\s+converging"):
        D.connected_components(pairs, max_iter=2)


def test_near_dedup_keep_first_elects_min_id(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 8, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(2, 3), (1, 2), (7, 8)], "id_a long, id_b long")
    rows = D.near_dedup_keep_first(docs, "doc_id", pairs).collect()
    kept = {r.doc_id for r in rows if r.is_representative == 1}
    comp = {r.doc_id: r.component for r in rows}
    assert kept == {1, 7, 9}  # min of {1,2,3}, min of {7,8}, isolated 9
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}


def test_lsh_blocked_near_dup_finds_near_identical_vectors(spark):
    import random

    rng = random.Random(9)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    # near-identical twins of the first 3 vectors (tiny perturbation)
    rows += [(100 + i, [x + 1e-4 for x in base[i]]) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in D.lsh_blocked_near_dup_pairs(
            df, "id", "v", threshold=0.999, n_planes=4
        ).collect()
    }
    # every planted twin shares all sign bits with its source -> found
    assert {(0, 100), (1, 101), (2, 102)} <= got
    # and nothing below the cosine threshold sneaks in
    from datas_spark.operators import similarity  # planes are deterministic

    assert all(a != b for a, b in got)


def test_near_dedup_keep_best_elects_highest_score(spark):
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (7, 1.0), (8, 1.0), (9, 4.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame([(2, 3), (1, 2), (7, 8)], "id_a long, id_b long")
    rows = D.near_dedup_keep_best(docs, "doc_id", "score", pairs).collect()
    kept = {r.doc_id for r in rows if r.is_representative == 1}
    # {1,2,3}: doc 2 has the top score; {7,8}: tie -> min id 7; 9 isolated
    assert kept == {2, 7, 9}
    comp = {r.doc_id: r.component for r in rows}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}


def test_paragraph_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "subscribe now\nreal content one"),
            (2, "subscribe now\nreal content two"),
            (3, "subscribe now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in D.paragraph_dedup(docs, "doc_id", "text").collect()
    }
    # doc 1 owns the first "subscribe now"; docs 2 and 3 lose it
    assert out[1].text_dedup == "subscribe now\nreal content one"
    assert out[1].n_kept == 2 and out[1].n_dropped == 0
    assert out[2].text_dedup == "real content two"
    assert out[2].n_kept == 1 and out[2].n_dropped == 1
    # doc 3 loses its only paragraph but still appears, empty
    assert out[3].text_dedup == "" and out[3].n_kept == 0 and out[3].n_dropped == 1


def test_paragraph_dedup_short_segments_bypass_election(spark):
    docs = spark.createDataFrame(
        [(1, "aa\nx\nbb"), (2, "x\ncc")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text_dedup
        for r in D.paragraph_dedup(docs, "doc_id", "text", min_chars=2).collect()
    }
    # "x" is under min_chars: kept in BOTH docs, never elected
    assert out[1] == "aa\nx\nbb"
    assert out[2] == "x\ncc"


def test_pagerank_star_graph_center_dominates(spark):
    from datas_spark.operators.dedup import pagerank

    # star: node 0 connected to 1..6 — the hub must outrank every leaf
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "id_a long, id_b long"
    )
    got = {r.node: r.pagerank for r in pagerank(pairs, iterations=3).collect()}
    assert set(got) == set(range(7))
    assert got[0] == max(got.values())
    leaves = {got[i] for i in range(1, 7)}
    assert len(leaves) == 1  # symmetry: all leaves equal
    # probability mass approximately conserved (no dangling nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-3
    # deterministic across layouts
    again = pagerank(
        spark.createDataFrame(
            [(0, i) for i in range(1, 7)], "id_a long, id_b long"
        ).repartition(5),
        iterations=3,
    )
    assert {r.node: r.pagerank for r in again.collect()} == got


def test_simhash_near_dup_banding_complete_recall(spark):
    from datas_spark.operators.dedup import simhash, simhash_near_dup_pairs

    texts = [
        (i, f"shared boilerplate body text segment number {'common' if i % 3 else 'rare'} "
            f"with tail variation {i % 5}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    # brute force over all pairs: banding must find EVERY pair within
    # the hamming budget (pigeonhole: max_hamming < bands)
    sigs = {r.doc_id: r.simhash for r in simhash(docs, "text").collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want and len(want) > 0


def test_simhash_near_dup_rejects_inexact_config(spark):
    import pytest

    from datas_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exact"):
        simhash_near_dup_pairs(docs, "doc_id", "text", bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(docs, "doc_id", "text", bits=32, bands=5, max_hamming=3)


def test_simhash_wide_signature_bounds_bucket_occupancy(spark):
    """The flagship near-dup config (60-bit, 4x15-bit bands) must keep
    band-bucket occupancy small on real corpus data — occupancy is what
    the quadratic candidate count grows with. The 32-bit 4x8 split of
    the same corpus concentrates the same rows into 256-value bands."""
    from pyspark.sql import functions as F

    from datas_spark.operators.dedup import simhash

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
    )

    def bucket_stats(bits: int, bands: int):
        width = bits // bands
        mask = (1 << width) - 1
        sig = simhash(docs, "text", bits=bits)
        return (
            sig.select(
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright("simhash", b * width)
                            .bitwiseAND(F.lit(mask)).alias("bval"),
                        )
                        for b in range(bands)
                    ])
                ).alias("bb")
            )
            .groupBy("bb.band", "bb.bval")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("candidates"),
                F.expr("percentile(c, 0.99)").alias("p99"),
            )
            .collect()[0]
        )

    wide = bucket_stats(60, 4)
    narrow = bucket_stats(32, 4)
    n = docs.count()
    # quadratic work metric: total in-bucket candidate pairs. The wide
    # config must stay near-linear in n (hot buckets only from genuine
    # near-dup clusters), and far below the narrow config's
    assert wide.candidates <= 8 * n  # testdata holds real dup clusters
    assert wide.candidates * 5 <= narrow.candidates
    # typical (p99) bucket occupancy stays single-digit-ish
    assert wide.p99 <= max(4, n // 50)


def test_simhash_near_dup_bucket_cap_suppresses_hot_buckets(spark):
    from datas_spark.operators.dedup import simhash_near_dup_pairs

    # many near-identical docs -> hot buckets; the cap bounds candidates
    docs = spark.createDataFrame(
        [(i, f"identical boilerplate body {'x' if i % 10 == 0 else 'x'} tail")
         for i in range(30)],
        "doc_id long, text string",
    )
    uncapped = simhash_near_dup_pairs(docs, "doc_id", "text").count()
    capped = simhash_near_dup_pairs(docs, "doc_id", "text", max_bucket_size=5).count()
    assert uncapped > 0
    # every bucket exceeds the cap here, so all candidates are suppressed
    assert capped == 0
    # a generous cap changes nothing
    assert (
        simhash_near_dup_pairs(docs, "doc_id", "text", max_bucket_size=1000).count()
        == uncapped
    )


def test_simhash_auto_cap_is_identity_below_floor(spark, sf_dir):
    """The corpus-scaled auto cap (VERDICT r7 #1) must be a no-op at
    test scales: its 1024 floor sits far above any measured bucket
    occupancy (max 321 at sf1), so the capped flagship's output is
    bit-identical to the uncapped run."""
    from datas_spark.io.sources import read_table
    from datas_spark.operators.dedup import simhash_near_dup_pairs

    docs = read_table(spark, sf_dir, "documents")
    base = simhash_near_dup_pairs(docs, "doc_id", "text", bits=60, bands=4)
    auto = simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_bucket_size="auto"
    )
    base_set = {(r.id_a, r.id_b, r.hamming) for r in base.collect()}
    auto_set = {(r.id_a, r.id_b, r.hamming) for r in auto.collect()}
    assert base_set == auto_set and len(base_set) == base.count()


def test_simhash_auto_cap_binds_on_degenerate_corpus(spark):
    """When every bucket is hotter than the cap formula allows, the
    auto cap must actually drop buckets — the quadratic bound is real,
    not just a documented intention. 3000 near-identical docs share
    band values, blowing a synthetic floor... the real floor is 1024,
    so exceed it."""
    from datas_spark.operators.dedup import (
        hamming_hot_bucket_members,
        simhash,
        simhash_near_dup_pairs,
    )

    n = 1200  # > AUTO_CAP_FLOOR=1024 docs in one boilerplate cluster
    docs = spark.createDataFrame(
        [(i, "identical boilerplate body x tail") for i in range(n)],
        "doc_id long, text string",
    )
    capped = simhash_near_dup_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_bucket_size="auto"
    ).count()
    assert capped == 0  # all four band buckets hold n > 1024 members
    # ...and the routing half lists exactly those docs for the verify tier
    sig = simhash(docs, "text", 60).select("doc_id", "simhash")
    hot = hamming_hot_bucket_members(
        sig, "doc_id", "simhash", bits=60, bands=4, max_bucket_size="auto"
    )
    assert hot.count() == n


def test_hot_bucket_members_route_to_shingle_verify_tier(spark):
    """The cap's documented recovery path end-to-end: a genuine dup
    pair living in an over-cap bucket is dropped by the capped hamming
    run, listed by hamming_hot_bucket_members, and RECOVERED by the
    MinHash verify tier run on just those members."""
    from datas_spark.operators.dedup import (
        hamming_hot_bucket_members,
        minhash_lsh_pairs,
        simhash,
        simhash_near_dup_pairs,
    )

    # 12 boilerplate docs (hot bucket under cap=8) containing a true
    # dup pair; two unrelated docs stay in cold buckets
    rows = [
        (i, "shared boilerplate template body number %d with filler text" % i)
        for i in range(12)
    ]
    rows += [(100, "a completely different document about gardens and rivers"),
             (101, "a completely different document about gardens and rivers")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = simhash(docs, "text", 60).select("doc_id", "simhash")
    from datas_spark.operators.dedup import hamming_near_dup_pairs

    capped = hamming_near_dup_pairs(
        sig, "doc_id", "simhash", bits=60, bands=4, max_hamming=3,
        max_bucket_size=8,
    )
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in capped_pairs  # cold-bucket pair unaffected
    hot_ids = {
        r.doc_id
        for r in hamming_hot_bucket_members(
            sig, "doc_id", "simhash", bits=60, bands=4, max_bucket_size=8
        ).collect()
    }
    if hot_ids:  # boilerplate docs landed in a hot bucket
        rescued = minhash_lsh_pairs(
            docs.where(F.col("doc_id").isin(hot_ids)),
            "doc_id", "text", min_est_jaccard=0.5,
        )
        total = capped_pairs | {(r.id_a, r.id_b) for r in rescued.collect()}
        # the verify tier finds the template cluster's high-overlap pairs
        assert any(a < 12 and b < 12 for a, b in total)


def test_cap_agreement_matches_two_real_runs(spark, sf_dir):
    """hamming_cap_agreement's single-pass Venn must equal the numbers
    from actually running capped and uncapped twins and anti-joining —
    including the structural guarantee that capped ⊆ uncapped."""
    from datas_spark.io.sources import read_table
    from datas_spark.operators.dedup import (
        hamming_cap_agreement,
        hamming_near_dup_pairs,
        simhash,
    )

    docs = read_table(spark, sf_dir, "documents")
    sig = simhash(docs, "text", 60).select("doc_id", "simhash")
    cap = 3  # tight enough to bind even at sf0.001
    row = hamming_cap_agreement(
        sig, "doc_id", "simhash", bits=60, bands=4, max_hamming=3,
        max_bucket_size=cap,
    ).collect()[0]
    capped = hamming_near_dup_pairs(
        sig, "doc_id", "simhash", bits=60, bands=4, max_hamming=3,
        max_bucket_size=cap,
    )
    uncapped = hamming_near_dup_pairs(
        sig, "doc_id", "simhash", bits=60, bands=4, max_hamming=3
    )
    only_capped = capped.join(uncapped, ["id_a", "id_b"], "left_anti").count()
    only_uncapped = uncapped.join(capped, ["id_a", "id_b"], "left_anti").count()
    both = capped.join(uncapped, ["id_a", "id_b"], "left_semi").count()
    assert only_capped == 0  # capped is a true subset
    assert row.pairs_both == both
    assert row.pairs_only_uncapped == only_uncapped


# --- prefix-filtered Jaccard + duplicated-n-gram coverage (batch 54) ---

def test_prefix_filter_matches_inverted_index(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different sentence with other words entirely"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "short text"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.2, 0.5, 0.9):
        full = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in D.ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=t, max_shingle_freq=None
            ).collect()
        }
        pref = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in D.prefix_filter_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        assert pref == full
    assert (1, 4) in pref and pref[(1, 4)] == 1.0


def test_prefix_filter_boundary_length_pair_survives(spark):
    # |A| = 1, |B| = 5 shingles, A ⊂ B ⇒ J = 1/5 = exactly the 0.2
    # threshold: the float-jitter-prone case the epsilon guard covers
    a = "w1 w2 w3"
    b = "w1 w2 w3 x1 x2 x3 x4"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = D.prefix_filter_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.2).collect()
    assert len(got) == 1 and got[0].jaccard == 0.2


def test_duplicate_ngram_coverage_hand_example(spark):
    rows = [
        (1, "a b c d e f"),        # 5-grams: "a b c d e", "b c d e f"
        (2, "a b c d e zzz"),      # shares "a b c d e" only
        (3, "q r s t u v"),        # unique grams
        (4, "x"),                  # too short: zero grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in D.duplicate_ngram_coverage(df, "doc_id", "text", n=5).collect()}
    assert got[1].n_grams == 2 and got[1].dup_grams == 1 and got[1].dup_coverage == 0.5
    assert got[2].dup_grams == 1
    assert got[3].dup_grams == 0 and got[3].dup_coverage == 0.0
    assert got[4].n_grams == 0 and got[4].dup_coverage == 0.0


def test_k_core_peels_dangles_and_keeps_cliques(spark):
    # triangle {1,2,3} + a tail 3-4-5: 2-core = the triangle only
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    got = {r.node: r.degree for r in D.k_core(pairs, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_cascading_peel(spark):
    # chain 1-2-3-4: every node ends below degree 2 → empty 2-core
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    assert D.k_core(pairs, k=2).collect() == []
    # k=1 keeps everything with at least one edge
    got = {r.node for r in D.k_core(pairs, k=1).collect()}
    assert got == {1, 2, 3, 4}


def test_k_core_validates_k(spark):
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        D.k_core(pairs, k=0)
    with _pytest.raises(ValueError):
        D.k_core(pairs, k=2, batch_rounds=0)


def test_k_core_blocked_equals_iterative(spark):
    # round 12 (VERDICT r11 #6): on a block-disjoint graph the
    # block-local peel must equal the global iterative k_core exactly —
    # cascades, cliques, cycles, and hash-seeded randoms per block.
    import hashlib

    rows = []
    # block 0: clique {0..3} + 7-chain tail (deep cascade)
    rows += [(a, b, 0) for a in range(4) for b in range(a + 1, 4)]
    rows += [(0, 10, 0), (10, 11, 0), (11, 12, 0), (12, 13, 0), (13, 14, 0)]
    # block 1: pure 5-cycle (fixpoint from round 0)
    rows += [(20 + i, 20 + (i + 1) % 5, 1) for i in range(5)]
    # block 2: hash-seeded random graph on its own node range
    for i in range(40):
        h = hashlib.md5(f"kcb{i}".encode()).hexdigest()
        a, b = 40 + int(h[:4], 16) % 20, 40 + int(h[4:8], 16) % 20
        if a != b:
            rows.append((min(a, b), max(a, b), 2))
    pairs = spark.createDataFrame(rows, ["id_a", "id_b", "blk"])
    for k in (1, 2, 3):
        blocked = sorted(
            map(tuple, D.k_core_blocked(pairs, "blk", k=k).collect())
        )
        iterative = sorted(map(tuple, D.k_core(pairs, k=k).collect()))
        assert blocked == iterative, k


def test_k_core_blocked_enforces_edge_cap(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (1, 3, 0)], ["id_a", "id_b", "blk"]
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="max_block_edges"):
        D.k_core_blocked(pairs, "blk", k=2, max_block_edges=2).collect()


@pytest.mark.slow
def test_k_core_batched_equals_per_round_check(spark):
    # round 12 (VERDICT r11 #6): the batched convergence check must be
    # output-identical to the per-round check — deterministic adversarial
    # graphs: long cascade chains hanging off cliques (worst case for a
    # coarse check: convergence mid-batch), a pure cycle (fixpoint from
    # round 0), and hash-seeded pseudo-random edges.
    import hashlib

    cases = []
    # clique {0..3} with a 7-chain tail off node 0, plus an isolated 5-cycle
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(0, 10), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16)]
    cycle = [(20 + i, 20 + (i + 1) % 5) for i in range(5)]
    cases.append(clique + tail + cycle)
    # hash-seeded sparse random graph (24 nodes, ~30 edges)
    rnd = []
    for i in range(30):
        h = hashlib.md5(f"kcore{i}".encode()).hexdigest()
        a, b = int(h[:4], 16) % 24, int(h[4:8], 16) % 24
        if a != b:
            rnd.append((min(a, b), max(a, b)))
    cases.append(rnd)
    for rows in cases:
        pairs = spark.createDataFrame(rows, ["id_a", "id_b"])
        for k in (1, 2, 3):
            batched = sorted(map(tuple, D.k_core(pairs, k=k, batch_rounds=3).collect()))
            per_round = sorted(map(tuple, D.k_core(pairs, k=k, batch_rounds=1).collect()))
            assert batched == per_round, (k, rows)


@pytest.mark.slow
def test_merge_components_equals_full_recompute(spark):
    # old graph: {1,2}, {3}; new pairs bridge 2-3 and add {10,11}
    old_pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    old_nodes = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    stored = D.near_dedup_keep_first(old_nodes, "doc_id", old_pairs).select(
        F.col("doc_id").alias("node"), "component"
    )
    new_pairs = spark.createDataFrame([(2, 3), (10, 11)], ["id_a", "id_b"])
    merged = {r.node: r.component for r in D.merge_components(stored, new_pairs).collect()}
    # full recompute over all pairs
    all_pairs = old_pairs.unionByName(new_pairs)
    full = {r.node: r.component for r in D.connected_components(all_pairs).collect()}
    full.setdefault(3, full.get(3, 3))
    for n in (1, 2, 3, 10, 11):
        assert merged[n] == full.get(n, n)
    assert merged[3] == 1 and merged[11] == 10


def test_long_gram_overlap_spans_finds_maximal_run(spark):
    from datas_spark.operators.dedup import long_gram_overlap_spans

    shared = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"{shared} zeta eta theta iota kappa lambda"),
        (3, "totally different words with no overlap at all here friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = long_gram_overlap_spans(df, "doc_id", "text", n=8).collect()
    assert len(out) == 1
    r = out[0]
    # shared run is 12 words: starts after 2 words in doc 1, at 0 in doc 2
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.start_a == 2 and r.start_b == 0 and r.len_tokens == 12


def test_long_gram_overlap_spans_two_disjoint_spans(spark):
    from datas_spark.operators.dedup import long_gram_overlap_spans

    s1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    s2 = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    df = spark.createDataFrame(
        [
            (1, f"{s1} xx yy {s2}"),
            (2, f"{s2} qq ww ee rr {s1}"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        long_gram_overlap_spans(df, "doc_id", "text", n=8).collect(),
        key=lambda r: r.start_a,
    )
    assert [(r.start_a, r.start_b, r.len_tokens) for r in out] == [
        (0, 13, 8),   # s1: doc1 offset 0, doc2 offset 13
        (10, 0, 9),   # s2: doc1 offset 10, doc2 offset 0
    ]


def test_long_gram_overlap_spans_doc_freq_cap(spark):
    from datas_spark.operators.dedup import long_gram_overlap_spans

    boiler = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string"
    )
    # cap of 3 excludes the gram (present in 5 docs)
    assert (
        long_gram_overlap_spans(df, "doc_id", "text", n=8, max_gram_doc_freq=3).count()
        == 0
    )
    # cap of 5 keeps it: C(5,2) pairs
    assert (
        long_gram_overlap_spans(df, "doc_id", "text", n=8, max_gram_doc_freq=5).count()
        == 10
    )


def test_cut_overlap_spans_removes_later_copy_only(spark):
    from datas_spark.operators.dedup import (
        cut_overlap_spans,
        long_gram_overlap_spans,
    )

    shared = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} zeta eta theta"),
            (3, "nothing in common with anybody else at all right here"),
        ],
        "doc_id long, text string",
    )
    spans = long_gram_overlap_spans(df, "doc_id", "text", n=8)
    out = {r.doc_id: r for r in cut_overlap_spans(df, spans, "doc_id", "text").collect()}
    # doc 1 (first occurrence) untouched; doc 2 loses the 12-token span
    assert out[1].n_tokens_cut == 0 and "one two three" in out[1].text_cut
    assert out[2].n_tokens_cut == 12 and out[2].text_cut == "zeta eta theta"
    assert out[3].n_tokens_cut == 0


def test_cut_overlap_spans_overlapping_intervals(spark):
    from datas_spark.operators.dedup import cut_overlap_spans

    df = spark.createDataFrame(
        [(5, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 5, 0, 2, 4), (2, 5, 0, 4, 3)],
        "id_a long, id_b long, start_a long, start_b long, len_tokens long",
    )
    r = cut_overlap_spans(df, spans, "doc_id", "text").collect()[0]
    # intervals [2,6) and [4,7) union to [2,7): 5 tokens cut
    assert r.n_tokens_cut == 5
    assert r.text_cut == "t0 t1 t7 t8 t9"


# ---------------------------------------------------------------------------
# corpus-wide span-family election (round 6)
# ---------------------------------------------------------------------------

def _chained_copy_docs(spark):
    """The chained-copy fixture: A (id 3, latest) = alpha+mid+gamma;
    B (id 1) copied alpha+mid from A's content; C (id 2) copied
    mid+gamma. B~C share only mid (4 tokens < n=8), so no (B, C) pair
    exists — the pairwise keep-first hole."""
    alpha = [f"a{i}" for i in range(8)]
    mid = [f"m{i}" for i in range(4)]
    gamma = [f"g{i}" for i in range(8)]
    b = " ".join(alpha + mid + ["bu1", "bu2", "bu3"])
    c = " ".join(["cv1", "cv2", "cv3"] + mid + gamma)
    a = " ".join(alpha + mid + gamma)
    return (
        spark.createDataFrame(
            [(1, b), (2, c), (3, a)], "doc_id: long, text: string"
        ),
        alpha, mid, gamma,
    )


def _survivor_counts(rows, tokens):
    joined = " " + " ".join(r["text_cut"] for r in rows) + " "
    return {t: joined.count(f" {t} ") for t in tokens}


def test_pairwise_cut_double_keeps_chained_copies(spark):
    """Documents the pairwise rule's hole the election fixes: each of
    B and C wins its own pair against A, so the shared mid content
    survives TWICE while A loses everything."""
    docs, alpha, mid, gamma = _chained_copy_docs(spark)
    spans = D.long_gram_overlap_spans(docs, "doc_id", "text", n=8)
    rows = D.cut_overlap_spans(docs, spans, "doc_id", "text").collect()
    counts = _survivor_counts(rows, mid)
    assert all(v == 2 for v in counts.values())  # the double-keep


def test_elected_cut_keeps_every_span_exactly_once(spark):
    docs, alpha, mid, gamma = _chained_copy_docs(spark)
    spans = D.long_gram_overlap_spans(docs, "doc_id", "text", n=8)
    out = {r["doc_id"]: r for r in
           D.cut_overlap_spans_elected(docs, spans, "doc_id", "text").collect()}
    counts = _survivor_counts(list(out.values()), alpha + mid + gamma)
    assert all(v == 1 for v in counts.values())  # exactly once, corpus-wide
    # the hub doc (longest merged extent) is the canonical owner
    assert out[3]["n_tokens_cut"] == 0
    assert out[1]["text_cut"] == "bu1 bu2 bu3"
    assert out[2]["text_cut"] == "cv1 cv2 cv3"


def test_elect_span_owners_families_and_flags(spark):
    docs, alpha, mid, gamma = _chained_copy_docs(spark)
    spans = D.long_gram_overlap_spans(docs, "doc_id", "text", n=8)
    fams = D.elect_span_owners(spans).collect()
    # one family: A's two overlapping occurrences merged into [0, 20)
    assert len({r["component"] for r in fams}) == 1
    by_doc = {r["doc"]: r for r in fams}
    assert len(fams) == 3 and set(by_doc) == {1, 2, 3}
    assert (by_doc[3]["s"], by_doc[3]["e"], by_doc[3]["is_owner"]) == (0, 20, True)
    assert not by_doc[1]["is_owner"] and not by_doc[2]["is_owner"]


def test_elected_cut_identical_docs_keep_first(spark):
    text = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, text)], "doc_id: long, text: string"
    )
    spans = D.long_gram_overlap_spans(docs, "doc_id", "text", n=8)
    out = {r["doc_id"]: r for r in
           D.cut_overlap_spans_elected(docs, spans, "doc_id", "text").collect()}
    assert out[1]["n_tokens_cut"] == 0
    assert out[2]["text_cut"] == "" and out[3]["text_cut"] == ""


def test_elected_cut_no_spans_passthrough(spark):
    docs = spark.createDataFrame(
        [(1, "totally unique words here"), (2, "other different content row")],
        "doc_id: long, text: string",
    )
    spans = D.long_gram_overlap_spans(docs, "doc_id", "text", n=3)
    out = D.cut_overlap_spans_elected(docs, spans, "doc_id", "text").collect()
    assert all(r["n_tokens_cut"] == 0 for r in out) and len(out) == 2


# ---------------------------------------------------------------------------
# round 6: per-node clustering coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_clique_vs_chain(spark):
    from datas_spark.operators.dedup import clustering_coefficient

    # K4 clique on 1-4 plus a chain 10-11-12
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (10, 11), (11, 12)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r for r in clustering_coefficient(pairs).collect()}
    for v in (1, 2, 3, 4):
        assert got[v]["degree"] == 3
        assert got[v]["n_triangles"] == 3
        assert got[v]["local_cc"] == 1.0
    assert got[11]["degree"] == 2 and got[11]["n_triangles"] == 0
    assert got[11]["local_cc"] == 0.0
    # degree-1 leaves: coefficient defined as 0
    assert got[10]["local_cc"] == 0.0 and got[10]["degree"] == 1


def test_snn_edge_weights_clique_vs_bridge(spark):
    from datas_spark.operators.dedup import snn_edge_weights

    # K4 on 1-4 bridged to K3 on 5-7 via edge (4,5)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6), (5, 7), (6, 7), (4, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r for r in snn_edge_weights(pairs).collect()}
    # inside K4: each edge shares the other 2 clique members; unions:
    # for edge (1,2): N(1)\{2}={3,4}, N(2)\{1}={3,4} -> common=2, union=2 -> 1.0
    assert got[(1, 2)]["common"] == 2 and got[(1, 2)]["snn_weight"] == 1.0
    # the bridge (4,5): no common neighbors
    assert got[(4, 5)]["common"] == 0 and got[(4, 5)]["snn_weight"] == 0.0
    # edge (3,4): 4 also touches 5 -> union = {1,2} U {1,2,5} = 3, common 2
    assert got[(3, 4)]["common"] == 2
    assert abs(got[(3, 4)]["snn_weight"] - 0.666667) < 1e-9


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

def _winnow(spark, rows, k=3, w=3):
    from datas_spark.operators.dedup import winnowing_fingerprints
    df = spark.createDataFrame(rows, "id long, text string")
    return winnowing_fingerprints(df, "id", "text", k=k, w=w)


def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of >= w+k-1 tokens must leave at least one
    identical fingerprint hash in both docs (the MOSS guarantee)."""
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three four " + shared + " five"),
    ]
    fps = _winnow(spark, rows, k=3, w=3).collect()
    h1 = {r.fp_hash for r in fps if r.id == 1}
    h2 = {r.fp_hash for r in fps if r.id == 2}
    assert h1 & h2, "shared long substring must share a fingerprint"


def test_winnowing_every_window_covered(spark):
    """Each window of w consecutive grams contains a selected position
    (coverage), and the selected hash is the window min."""
    text = " ".join(f"tok{i % 7}x{i * 13 % 11}" for i in range(40))
    k, w = 3, 4
    fps = _winnow(spark, [(1, text)], k=k, w=w).collect()
    pos = sorted(r.fp_pos for r in fps)
    ng = 40 - (k - 1)
    for start in range(0, ng - w + 1):
        assert any(start <= p <= start + w - 1 for p in pos), (
            f"window at {start} has no fingerprint"
        )
    # density ~ 2/(w+1): never more than one per position, far fewer
    # than all grams
    assert len(pos) < ng


def test_winnowing_short_doc_single_window(spark):
    """Docs with fewer than w grams winnow the whole doc: exactly one
    fingerprint (the global min, rightmost on ties)."""
    fps = _winnow(spark, [(1, "a b c d")], k=3, w=8).collect()
    assert len(fps) == 1
    # doc shorter than k tokens: no grams, no rows
    none = _winnow(spark, [(2, "a b")], k=3, w=8).collect()
    assert none == []


def test_winnowing_rightmost_tiebreak(spark):
    """Identical gram hashes in one window select the RIGHTMOST
    occurrence (robust winnowing)."""
    # repeat the same 3-gram so window contains duplicate hashes
    text = "x y z x y z x y z"
    fps = _winnow(spark, [(1, text)], k=3, w=7).collect()
    # 7 grams, one window [0..6]; duplicate hash at pos 0,3,6 (gram
    # "x y z") etc.; whatever the min hash is, the rightmost of its
    # occurrences must be the selected one
    assert len(fps) == 1
    sel = fps[0]
    from datas_spark.operators.dedup import winnowing_fingerprints  # noqa: F401
    # recompute hashes via the oracle-shared rule to find expected pick
    import hashlib
    toks = text.split()
    grams = [" ".join(toks[i:i + 3]) for i in range(7)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    best = min(range(7), key=lambda i: (hs[i], -i))
    assert (sel.fp_pos, sel.fp_hash) == (best, hs[best])


def test_winnowing_pairs_min_shared(spark):
    from datas_spark.operators.dedup import winnowing_near_dup_pairs
    shared = " ".join(f"s{i}" for i in range(30))
    rows = [
        (1, "intro " + shared),
        (2, shared + " outro"),
        (3, " ".join(f"zzz{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = winnowing_near_dup_pairs(
        df, "id", "text", k=3, w=3, min_shared=2
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].shared_fps >= 2


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction
# ---------------------------------------------------------------------------

def _aa(spark, edges, cap=50):
    from datas_spark.operators.dedup import adamic_adar_link_prediction
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return adamic_adar_link_prediction(df, max_hub_degree=cap)


def test_adamic_adar_path_predicts_endpoints(spark):
    """Path 1-2-3: the only non-edge sharing a neighbor is (1,3) via
    z=2 with deg(2)=2 -> score 1/ln(2)."""
    import math
    out = _aa(spark, [(1, 2), (2, 3)]).collect()
    assert [(r.id_a, r.id_b, r.n_common) for r in out] == [(1, 3, 1)]
    assert abs(out[0].aa_score - round(1.0 / math.log(2.0), 6)) < 1e-9


def test_adamic_adar_excludes_existing_edges(spark):
    """Triangle 1-2-3: every pair is already an edge -> no candidates."""
    assert _aa(spark, [(1, 2), (2, 3), (1, 3)]).collect() == []


def test_adamic_adar_multiple_common_neighbors(spark):
    """1 and 4 share neighbors 2 (deg 2) and 3 (deg 3): score sums
    both 1/ln(deg) terms; n_common = 2."""
    import math
    edges = [(1, 2), (2, 4), (1, 3), (3, 4), (3, 5)]
    out = {(r.id_a, r.id_b): r for r in _aa(spark, edges).collect()}
    r14 = out[(1, 4)]
    assert r14.n_common == 2
    exp = 1.0 / math.log(2.0) + 1.0 / math.log(3.0)
    assert abs(r14.aa_score - round(exp, 6)) < 1e-9


@pytest.mark.slow
def test_adamic_adar_hub_cap_drops_wedges(spark):
    """A hub over the cap contributes no wedges at all."""
    edges = [(10, i) for i in range(1, 6)]  # star: deg(10)=5
    assert _aa(spark, edges, cap=4).collect() == []
    spokes = _aa(spark, edges, cap=5).collect()
    # all C(5,2) spoke pairs predicted through the hub
    assert len(spokes) == 10


@pytest.mark.slow
def test_purge_components_equals_full_rebuild(spark):
    """Deleting nodes splits/repairs only affected components; result
    == full CC rebuild over the purged pair set (min-id labels are
    component-local, so the decomposition is label-stable)."""
    from datas_spark.operators.dedup import connected_components, purge_components

    # comp {1,2,3,4} is a CHAIN 1-2-3-4 (deleting 2 splits it),
    # comp {10,11,12} is a triangle (deleting none),
    # comp {20,21} dies entirely when 20 and 21 are forgotten
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    assign = connected_components(pairs)
    forget = spark.createDataFrame([(2,), (20,), (21,)], "node long")

    purged = purge_components(assign, pairs, forget)
    # full rebuild over surviving pairs + surviving isolated nodes
    surv_pairs = spark.createDataFrame([(3, 4), (10, 11), (11, 12), (10, 12)],
                                       "id_a long, id_b long")
    rebuilt = connected_components(surv_pairs)
    # node 1 survives edgeless -> singleton
    expected = {(r.node, r.component) for r in rebuilt.collect()} | {(1, 1)}
    got = {(r.node, r.component) for r in purged.collect()}
    assert got == expected
    # the chain split: 1 alone, {3,4} relabeled to 3
    assert (3, 3) in got and (4, 3) in got and (1, 1) in got
    # forgotten nodes are gone
    assert not any(n in (2, 20, 21) for n, _ in got)


@pytest.mark.slow
def test_purge_components_untouched_pass_through(spark):
    from datas_spark.operators.dedup import connected_components, purge_components

    pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "id_a long, id_b long"
    )
    assign = connected_components(pairs)
    forget = spark.createDataFrame([(99,)], "node long")  # touches nothing
    purged = purge_components(assign, pairs, forget)
    assert {(r.node, r.component) for r in purged.collect()} == {
        (r.node, r.component) for r in assign.collect()
    }


@pytest.mark.slow
def test_label_propagation_splits_bridged_triangles(spark):
    """Two triangles joined by one bridge edge: CC merges them into one
    component; 4-round LPA keeps two communities (the bridge is
    outvoted by each side's internal majority)."""
    from datas_spark.operators.dedup import connected_components, label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["id_a", "id_b"],
    )
    cc = connected_components(pairs)
    assert cc.select("component").distinct().count() == 1
    out = {r.node: r for r in label_propagation(pairs, n_rounds=4).collect()}
    comms = {out[n].community for n in (1, 2, 3)} | {
        out[n].community for n in (4, 5, 6)
    }
    assert {out[1].community, out[2].community, out[3].community} == {out[1].community}
    assert {out[4].community, out[5].community, out[6].community} == {out[4].community}
    assert out[1].community != out[4].community
    assert all(out[n].community_size == 3 for n in out)


def test_label_propagation_clique_converges_to_min_label(spark):
    """A clique floods to one community; with the (count DESC, label
    ASC) tie-break the surviving label is the minimum node id."""
    from datas_spark.operators.dedup import label_propagation

    clique = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs = spark.createDataFrame(clique, ["id_a", "id_b"])
    out = label_propagation(pairs, n_rounds=4).collect()
    assert {r.community for r in out} == {10}
    assert all(r.community_size == 5 for r in out)


@pytest.mark.slow
def test_label_propagation_is_deterministic_and_validates(spark):
    from datas_spark.operators.dedup import label_propagation
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    a = sorted(map(tuple, label_propagation(pairs, 3).collect()))
    b = sorted(map(tuple, label_propagation(pairs, 3).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        label_propagation(pairs, n_rounds=0)


# ---------------------------------------------------------------------------
# round 10: SemDeDup over Lloyd clusters
# ---------------------------------------------------------------------------


def test_semdedup_planted_near_identical_group(spark):
    """Three planted near-identical vectors must land in one duplicate
    component with exactly one keeper (the least-centroid-typical
    member); distinct vectors stay singleton keepers; every input row
    comes back labeled."""
    from datas_spark.operators.dedup import semdedup

    base = [0.4, 0.3, -0.2, 0.1]
    rows = [
        (1, base),
        (2, [x * 1.0001 for x in base]),           # near-identical twin
        (3, [x * 0.9999 for x in base]),           # and another
        (10, [-0.4, 0.35, 0.2, -0.1]),
        (11, [0.1, -0.45, 0.3, 0.25]),
        (12, [-0.2, -0.3, -0.4, 0.45]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = {r.id: r for r in semdedup(
        df, "id", "v", k=2, n_rounds=2, threshold=0.95).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 12}
    grp = {out[i].component for i in (1, 2, 3)}
    assert grp == {1}  # one component, min-id labeled
    keeps = [i for i in (1, 2, 3) if out[i].keep]
    assert len(keeps) == 1  # exactly one survivor in the dup group
    for i in (10, 11, 12):
        assert out[i].keep and out[i].component == i  # singletons keep


def test_semdedup_bucket_cap_bounds_pair_fan(spark):
    """max_bucket_side caps each (cluster, bucket) block to its
    smallest ids for pair generation: with cap=2, only the two
    smallest ids of a planted 4-twin group can pair, so the two
    larger twins fall out of the component and survive as singleton
    keepers — the documented recall trade; uncapped, all four dedup
    to one keeper."""
    from datas_spark.operators.dedup import semdedup

    base = [0.4, 0.3, -0.2, 0.1]
    rows = [(i, [x * (1.0 + i * 1e-5) for x in base]) for i in (1, 2, 3, 4)]
    rows += [(9, [-0.4, 0.35, 0.2, -0.1])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    kw = dict(k=1, n_rounds=1, threshold=0.95)
    full = {r.id: r for r in semdedup(df, "id", "v", **kw).collect()}
    assert sum(1 for i in (1, 2, 3, 4) if full[i].keep) == 1
    capped = {r.id: r for r in semdedup(
        df, "id", "v", max_bucket_side=2, **kw).collect()}
    assert sum(1 for i in (1, 2) if capped[i].keep) == 1  # pair formed
    for i in (3, 4):  # past the cap: no pairs, singleton keepers
        assert capped[i].keep and capped[i].component == i
    assert len(capped) == 5  # every input row still labeled


def test_semdedup_threshold_one_keeps_everything(spark):
    """threshold > max possible cosine -> no pairs -> everyone keeps."""
    from datas_spark.operators.dedup import semdedup

    rows = [(i, [float(i % 3) - 1.0, float(i % 5) / 5, 0.2, -0.1])
            for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = semdedup(df, "id", "v", k=2, n_rounds=1, threshold=1.0).collect()
    assert all(r.keep for r in out) and len(out) == 8

    import pytest as _pytest

    with _pytest.raises(ValueError):
        semdedup(df, "id", "v", threshold=1.5)


def test_minhash_lsh_plan_theory_and_measurement(spark):
    """S-curve sanity per plan: fewer rows per band = looser gate
    (higher collision probability at the target, more measured
    candidate pairs); the recommended plan at t=0.7 with 16 hashes is
    (4, 4) — the banding the engine's own near-dup queries hard-code;
    short docs (empty shingle sets) never generate candidates."""
    from datas_spark.operators.dedup import minhash_lsh_plan

    rows = [(i, "alpha beta gamma delta epsilon zeta " + f"w{i % 3}")
            for i in range(30)]
    rows += [(100 + i, "ab") for i in range(5)]  # shingle-less shorts
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bands: r for r in minhash_lsh_plan(
        df, "doc_id", "text", num_hashes=16, target_threshold=0.7
    ).collect()}
    assert set(out) == {1, 2, 4, 8, 16}
    ps = [out[b].p_at_target for b in (1, 2, 4, 8, 16)]
    assert ps == sorted(ps)  # more bands = looser = higher P(collide)
    cands = [out[b].cand_pairs for b in (1, 2, 4, 8, 16)]
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    assert [b for b, r in out.items() if r.is_recommended] == [4]
    for r in out.values():
        assert 0.0 <= r.fp_area and 0.0 <= r.fn_area
        assert abs(r.total_err - round(r.fp_area + r.fn_area, 6)) < 2e-6
    # shorts excluded: an all-shorts corpus measures zero candidates
    shorts = spark.createDataFrame(
        [(i, "xy") for i in range(6)], "doc_id long, text string")
    so = minhash_lsh_plan(shorts, "doc_id", "text", num_hashes=16).collect()
    assert all(r.cand_pairs == 0 for r in so)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        minhash_lsh_plan(df, "doc_id", "text", target_threshold=1.5)
    with _pytest.raises(ValueError):
        minhash_lsh_plan(df, "doc_id", "text", grid=50)  # not a power of 2
