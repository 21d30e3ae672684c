"""MLlib-backed ops (F2/F3) — seed-pinned invariants, since SVD signs
and centroid init aren't SQL-expressible (SURVEY §5)."""

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators.clustering import (
    cluster_indices,
    cluster_sizes,
    embedding_proxy,
    kmeans_cluster,
    pca_reduce,
)


def test_kmeans_partition_invariants(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    labeled = kmeans_cluster(emb, "embedding", k=3, seed=0)
    # every row gets exactly one label in 0..k-1; row count preserved
    assert labeled.count() == n
    labels = {r.cluster for r in labeled.select("cluster").distinct().collect()}
    assert labels <= {0, 1, 2} and len(labels) >= 2
    # deterministic under a fixed seed
    again = kmeans_cluster(emb, "embedding", k=3, seed=0)
    assert (
        labeled.select("vec_id", "cluster").subtract(again.select("vec_id", "cluster")).count()
        == 0
    )


def test_cluster_aggregates_partition_rows(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").withColumnRenamed("label", "cluster")
    sizes = {r.cluster: r.n_rows for r in cluster_sizes(emb).collect()}
    assert sum(sizes.values()) == emb.count()
    idx = cluster_indices(emb, "cluster", "vec_id").collect()
    assert sum(len(r.row_ids) for r in idx) == emb.count()
    for r in idx:
        assert r.row_ids == sorted(r.row_ids)


def test_pca_shapes_and_determinism(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    out = pca_reduce(emb, "embedding", k=4)
    assert out.count() == emb.count()
    first = out.select("pca").first().pca
    assert len(first) == 4
    # same seedless SVD on same data → same result
    again = pca_reduce(emb, "embedding", k=4).select("pca").first().pca
    assert first == again


def test_embedding_proxy_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(10)
    a = embedding_proxy(docs, "text", dim=8).select("doc_id", "emb_ins_alone")
    b = embedding_proxy(docs, "text", dim=8).select("doc_id", "emb_ins_alone")
    assert a.subtract(b).count() == 0
    vec = a.first().emb_ins_alone
    assert len(vec) == 8 and all(-0.5 <= x < 0.5 for x in vec)


# ---------------------------------------------------------------------------
# round 6: DBSCAN over a precomputed neighbor-pair frame
# ---------------------------------------------------------------------------


def test_dbscan_clique_border_noise(spark):
    from datas_spark.operators.clustering import dbscan_labels

    # clique 1-2-3 (all cores at min_pts=3), border 4 attached to 3,
    # isolated pair 10-11 (degree 1 -> non-core, no core neighbor -> noise),
    # fully isolated 20 -> noise
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r for r in dbscan_labels(ids, pairs, "id", min_pts=3).collect()}
    for v in (1, 2, 3):
        assert got[v]["role"] == "core" and got[v]["cluster"] == 1
    assert got[4]["role"] == "border" and got[4]["cluster"] == 1
    for v in (10, 11, 20):
        assert got[v]["role"] == "noise" and got[v]["cluster"] is None


def test_dbscan_singleton_core_and_min_border_attach(spark):
    from datas_spark.operators.clustering import dbscan_labels

    # star: center 5 with leaves 6,7 -> 5 is core (deg 2 + self = 3),
    # leaves are borders of 5's singleton cluster
    ids = spark.createDataFrame([(i,) for i in [5, 6, 7]], "id long")
    pairs = spark.createDataFrame([(5, 6), (5, 7)], "id_a long, id_b long")
    got = {r["id"]: r for r in dbscan_labels(ids, pairs, "id", min_pts=3).collect()}
    assert got[5]["role"] == "core" and got[5]["cluster"] == 5
    assert got[6]["role"] == "border" and got[6]["cluster"] == 5
    assert got[7]["role"] == "border" and got[7]["cluster"] == 5


# ---------------------------------------------------------------------------
# round 10: deterministic unrolled Lloyd's KMeans
# ---------------------------------------------------------------------------


def test_kmeans_lloyd_separated_blobs_and_determinism(spark):
    """Three well-separated 2-D blobs must come out as three pure
    clusters; a re-run (fresh plan) must assign identically (the
    whole point of the deterministic trainer)."""
    from datas_spark.operators.clustering import kmeans_lloyd

    rows = []
    for i in range(10):
        rows.append((i, [0.0 + i * 1e-4, 0.0]))          # blob A
        rows.append((100 + i, [0.4, 0.4 + i * 1e-4]))    # blob B
        rows.append((200 + i, [-0.4 - i * 1e-4, 0.4]))   # blob C
    df = spark.createDataFrame(rows, "id long, v array<double>")
    asg, cents = kmeans_lloyd(df, "id", "v", k=3, n_rounds=4)
    got = {r.id: r.cluster for r in asg.collect()}
    blobs = [
        {got[i] for i in range(10)},
        {got[100 + i] for i in range(10)},
        {got[200 + i] for i in range(10)},
    ]
    assert all(len(b) == 1 for b in blobs)          # each blob is pure
    assert len(set().union(*blobs)) == 3            # and they differ
    c = {r.cluster: r.centroid for r in cents.collect()}
    assert len(c) == 3 and all(len(v) == 2 for v in c.values())
    asg2, _ = kmeans_lloyd(df, "id", "v", k=3, n_rounds=4)
    assert {r.id: r.cluster for r in asg2.collect()} == got


def test_kmeans_lloyd_empty_cluster_carries_previous_centroid(spark):
    """k larger than the number of distinct points leaves clusters
    empty after round 1 — they must keep their seed centroid (no NULL
    centroids, no crash) and every point still gets a label."""
    from datas_spark.operators.clustering import kmeans_lloyd

    df = spark.createDataFrame(
        [(1, [0.1, 0.1]), (2, [0.1, 0.1]), (3, [-0.2, 0.3])],
        "id long, v array<double>",
    )
    asg, cents = kmeans_lloyd(df, "id", "v", k=3, n_rounds=2)
    labels = {r.id: r.cluster for r in asg.collect()}
    assert set(labels) == {1, 2, 3}
    assert labels[1] == labels[2]  # identical points share a cluster
    crows = cents.collect()
    assert len(crows) == 3
    assert all(r.centroid is not None and len(r.centroid) == 2 for r in crows)


def test_kmeans_lloyd_validates_params(spark):
    import pytest as _pytest

    from datas_spark.operators.clustering import kmeans_lloyd

    df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with _pytest.raises(ValueError):
        kmeans_lloyd(df, "id", "v", k=0)
    with _pytest.raises(ValueError):
        kmeans_lloyd(df, "id", "v", k=2, n_rounds=0)


# ---------------------------------------------------------------------------
# round 10: exact-covariance PCA (power iteration, e12 resync)
# ---------------------------------------------------------------------------


def test_pca_exact_matches_numpy_directions(spark):
    """On anisotropic synthetic data the power-iteration components
    must align with numpy's eigenvectors of the same covariance
    (|cos| ~ 1), be near-orthonormal, and order variance pc1 >= pc2."""
    import numpy as np

    from datas_spark.operators.clustering import (
        pca_exact_components,
        pca_exact_project,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(300, 4)) * np.array([0.3, 0.12, 0.05, 0.02])
    rot, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    data = base @ rot.T
    rows = [(int(i), [float(x) for x in data[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    comps, means, n = pca_exact_components(df, "v", k=2, dim=4, n_iters=12)
    assert n == 300 and len(comps) == 2 and all(len(c) == 4 for c in comps)
    c = np.array(comps)
    # unit norm + mutual orthogonality (up to the e12 resync grid)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-9)
    assert abs(float(c[0] @ c[1])) < 1e-6
    cov = np.cov((data * 1e6).round().T)  # the quantized covariance
    w, v = np.linalg.eigh(cov)
    top2 = v[:, ::-1][:, :2].T
    for got, ref in zip(c, top2):
        assert abs(float(got @ ref)) > 0.999  # aligned up to sign
    proj = pca_exact_project(df, "id", "v", k=2, dim=4, n_iters=12)
    p = np.array([[r.pc1, r.pc2] for r in proj.collect()])
    assert p.shape == (300, 2)
    assert p[:, 0].var() >= p[:, 1].var()  # variance ordering


def test_pca_exact_is_deterministic_and_validates(spark):
    import pytest as _pytest

    from datas_spark.operators.clustering import (
        pca_exact_components,
        pca_exact_project,
    )

    rows = [(i, [float(i % 7) / 7, float(i % 3) / 3]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    a, _, _ = pca_exact_components(df, "v", k=1, dim=2, n_iters=8)
    b, _, _ = pca_exact_components(df, "v", k=1, dim=2, n_iters=8)
    assert a == b  # bit-identical across runs
    with _pytest.raises(ValueError):
        pca_exact_components(df, "v", k=0)
    with _pytest.raises(ValueError):
        pca_exact_project(df, "id", "v", n_iters=0)
