"""Materialize-once artifact store: keying, skip-if-exists, and
recompute-equivalence (the invariant the oracle gate re-proves per
run, here isolated at unit scale with a scratch root)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import artifacts as ART
from datas_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def scratch_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", root)
    return root


def _parquet_mtime_set(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith("."):
                p = os.path.join(dirpath, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


@pytest.mark.slow
def test_pairs_artifact_matches_recompute(spark, scratch_root):
    docs = ART.read_table(spark, SF, "documents")
    live = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    cached = ART.pairs_artifact(spark, SF, "jaccard")
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))


@pytest.mark.slow
def test_components_artifact_matches_recompute(spark, scratch_root):
    pairs = ART.pairs_artifact(spark, SF, "jaccard")
    live = D.connected_components(pairs)
    cached = ART.components_artifact(spark, SF, "jaccard")
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))


def test_skip_if_exists_no_rewrite(spark, scratch_root):
    ART.pairs_artifact(spark, SF, "jaccard").count()
    before = _parquet_mtime_set(scratch_root)
    assert before, "artifact was not written"
    # second touch must be a pure read: no file rewritten
    ART.pairs_artifact(spark, SF, "jaccard").count()
    assert _parquet_mtime_set(scratch_root) == before
    # recompute=True forces a rewrite
    ART.pairs_artifact(spark, SF, "jaccard", recompute=True).count()
    assert _parquet_mtime_set(scratch_root) != before


def test_dataset_key_sensitivity(tmp_path):
    # distinct sf dirs never collide; same dir is stable
    k1 = ART.dataset_key("/root/testdata/sf0.001")
    k2 = ART.dataset_key("/root/testdata/sf0.01")
    assert k1 != k2
    assert ART.dataset_key("/root/testdata/sf0.001") == k1
    # a (re)generated parquet — different size/mtime — changes the key
    p = tmp_path / "documents.parquet"
    p.write_bytes(b"x" * 10)
    ka = ART.dataset_key(str(tmp_path))
    os.utime(p, ns=(1, 1))
    assert ART.dataset_key(str(tmp_path)) != ka


def test_unknown_family_raises(spark, scratch_root):
    with pytest.raises(ValueError, match="unknown family"):
        ART.pairs_artifact(spark, SF, "nope")


@pytest.mark.slow
def test_minhash_components_use_canonical_threshold(spark, scratch_root):
    # components over minhash pairs must filter est_jaccard >= 0.2
    pairs = ART.pairs_artifact(spark, SF, "minhash").where(
        F.col("est_jaccard") >= 0.2
    )
    live = D.connected_components(pairs)
    cached = ART.components_artifact(spark, SF, "minhash")
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))


def test_merge_into_components_artifact_equals_recompute(spark, scratch_root):
    from pyspark.sql import functions as F

    # seed the store with components over the OLD half of the pairs,
    # then merge the new half through the artifact API — result must
    # equal CC over ALL pairs
    all_pairs = ART.pairs_artifact(spark, SF, "jaccard")
    cut = 250
    old_pairs = all_pairs.where((F.col("id_a") < cut) & (F.col("id_b") < cut))
    new_pairs = all_pairs.where((F.col("id_a") >= cut) | (F.col("id_b") >= cut))
    # overwrite the components artifact with the old-only labels
    path = ART._family_path(SF, "jaccard", "components")
    D.connected_components(old_pairs).write.mode("overwrite").parquet(path)

    merged = ART.merge_into_components_artifact(spark, SF, new_pairs)
    full = D.connected_components(all_pairs)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # and the artifact on disk now holds the merged labels
    again = ART.components_artifact(spark, SF, "jaccard")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))


def test_artifact_status_reports_build_state(spark, scratch_root):
    rows = {(r["family"], r["kind"]): r for r in ART.artifact_status(spark, SF)}
    assert not rows[("simhash", "pairs")]["built"]
    ART.pairs_artifact(spark, SF, "simhash").count()
    rows = {(r["family"], r["kind"]): r for r in ART.artifact_status(spark, SF)}
    assert rows[("simhash", "pairs")]["built"]
    assert rows[("simhash", "pairs")]["rows"] > 0
    assert not rows[("simhash", "components")]["built"]


def test_gc_artifacts_keeps_latest(tmp_path, monkeypatch):
    import os
    import time

    from datas_spark.operators import artifacts as ART

    root = tmp_path / "art"
    root.mkdir()
    # three fingerprint dirs with staggered build recency
    for i, name in enumerate(["aaa111", "bbb222", "ccc333"]):
        d = root / name
        d.mkdir()
        f = d / "jaccard_pairs" / "part-0.parquet"
        f.parent.mkdir()
        f.write_bytes(b"x")
        ts = 1_700_000_000 + i * 1000
        os.utime(f, (ts, ts))
        os.utime(d, (ts, ts))
    removed = ART.gc_artifacts(2, root=str(root))
    assert [os.path.basename(p) for p in removed] == ["aaa111"]  # oldest
    assert sorted(os.listdir(root)) == ["bbb222", "ccc333"]
    # idempotent; keep 0 clears everything
    assert ART.gc_artifacts(2, root=str(root)) == []
    assert len(ART.gc_artifacts(0, root=str(root))) == 2
    assert os.listdir(root) == []
    # missing root is a no-op
    assert ART.gc_artifacts(3, root=str(root / "nope")) == []
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ART.gc_artifacts(-1, root=str(root))


def test_spans_artifact_matches_recompute_and_skips(spark, scratch_root):
    docs = ART.read_table(spark, SF, "documents")
    live = D.long_gram_overlap_spans(
        docs, "doc_id", "text", n=ART.SPAN_N, max_gram_doc_freq=ART.SPAN_CAP
    )
    cached = ART.spans_artifact(spark, SF)
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))
    # second touch is a pure read
    before = _parquet_mtime_set(scratch_root)
    ART.spans_artifact(spark, SF).count()
    assert _parquet_mtime_set(scratch_root) == before
    # and it shows up in the status inventory
    rows = {(r["family"], r["kind"]): r for r in ART.artifact_status(spark, SF)}
    assert rows[("spans", "spans")]["built"] is True


def test_pq_index_artifact_matches_rebuild_and_skips(spark, scratch_root):
    from pyspark.sql import functions as F

    from datas_spark.operators import similarity as SIM

    emb = ART.read_table(spark, SF, "embeddings")
    cells = emb.where(f"vec_id < {ART.PQ_CELLS}").select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    cbs = emb.where(f"vec_id < {ART.PQ_KS}").select(
        F.col("vec_id").alias("code"), "embedding"
    )
    live = SIM.ivfpq_build_fixed(
        emb, cells, cbs, "vec_id", "cell", "code", "embedding", m=ART.PQ_M
    )
    cached = ART.pq_index_artifact(spark, SF)
    key = lambda r: r[0]
    got = sorted((r["__did"], tuple(r["__codes"]), round(r["__dn2"], 9), r["__cell"])
                 for r in cached.collect())
    want = sorted((r["__did"], tuple(r["__codes"]), round(r["__dn2"], 9), r["__cell"])
                  for r in live.collect())
    assert got == want
    # second call reads the cache: no file rewrites
    before = _parquet_mtime_set(scratch_root)
    ART.pq_index_artifact(spark, SF)
    assert _parquet_mtime_set(scratch_root) == before


@pytest.mark.slow
def test_elected_spans_artifact_matches_recompute(spark, scratch_root):
    spans = ART.spans_artifact(spark, SF)
    live = D.elect_span_owners(spans)
    cached = ART.elected_spans_artifact(spark, SF)
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))
    # skip-if-exists: a second call reads parquet, no rewrite
    before = _parquet_mtime_set(scratch_root)
    ART.elected_spans_artifact(spark, SF).count()
    assert _parquet_mtime_set(scratch_root) == before


@pytest.mark.slow
def test_partial_components_artifact_matches_recompute(spark, scratch_root):
    from pyspark.sql import functions as F

    cut = 250
    pairs = ART.pairs_artifact(spark, SF, "jaccard")
    old_pairs = pairs.where((F.col("id_a") < cut) & (F.col("id_b") < cut))
    old_docs = (
        ART.read_table(spark, SF, "documents")
        .where(F.col("doc_id") < cut)
        .select("doc_id")
    )
    live = D.near_dedup_keep_first(old_docs, "doc_id", old_pairs).select(
        F.col("doc_id").alias("node"), "component"
    )
    cached = ART.partial_components_artifact(spark, SF, "jaccard", cut)
    assert sorted(map(tuple, cached.collect())) == sorted(map(tuple, live.collect()))
