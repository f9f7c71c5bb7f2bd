"""Deterministic distributed k-means: convergence, determinism, and the
recall improvement it buys the ANN paths over sampled centroids."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from victor_spark.operators.kmeans import fit_kmeans, seed_rows

SF_SMALL = "/root/testdata/sf0.01"


def _clustered_df(spark):
    rng = np.random.default_rng(11)
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    rows = []
    for i in range(90):
        c = centers[i % 3]
        v = c + rng.normal(0, 0.1, size=2)
        rows.append((f"id{i:03d}", [float(v[0]), float(v[1])]))
    return spark.createDataFrame(rows, "id string, v array<double>")


def test_l2_kmeans_finds_separated_clusters(spark):
    d = _clustered_df(spark)
    cents = np.asarray(fit_kmeans(d, "id", "v", k=3, max_iter=10, metric="l2"))
    # every true center is within noise distance of some fitted centroid
    true = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    for t in true:
        assert np.min(np.linalg.norm(cents - t, axis=1)) < 0.5


def test_kmeans_is_deterministic(spark):
    d = _clustered_df(spark)
    a = fit_kmeans(d, "id", "v", k=3, max_iter=5, metric="cosine")
    b = fit_kmeans(d, "id", "v", k=3, max_iter=5, metric="cosine")
    assert a == b
    # and the init is the documented salted-md5 rule
    assert seed_rows(d, "id", "v", 3, "kmeans") == seed_rows(d, "id", "v", 3, "kmeans")


def test_cosine_kmeans_returns_unit_centroids(spark):
    d = _clustered_df(spark)
    cents = np.asarray(fit_kmeans(d, "id", "v", k=3, max_iter=5, metric="cosine"))
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


def test_kmeans_beats_sampled_centroids_on_recall(spark):
    """The reason trainer='kmeans' exists: at equal (k, nprobe), Lloyd
    centroids follow the corpus density and capture more of each query's
    true neighborhood than sampled rows. Measured on the sf0.01 embeddings
    (near-isotropic — the HARD case for IVF; clustered corpora only widen
    the gap)."""
    from victor_spark.sources import load_table

    e = load_table(spark, SF_SMALL, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    k, nprobe = 16, 4
    sample = np.asarray(seed_rows(e, "id", "v", k, "ivf"))
    trained = np.asarray(
        fit_kmeans(e, "id", "v", k=k, max_iter=10, metric="cosine", salt="ivf")
    )

    X = np.asarray([r["v"] for r in e.orderBy("id").collect()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2.0)
    true10 = np.argsort(-S, axis=1)[:, :10]

    def recall(C):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        recs = []
        for q in range(0, len(X), 5):
            probe = set(np.argsort(-(Cn @ Xn[q]))[:nprobe])
            cand = [i for i in range(len(X)) if assign[i] in probe and i != q]
            cand = sorted(cand, key=lambda i: -S[q, i])[:10]
            recs.append(len(set(cand) & set(true10[q])) / 10)
        return float(np.mean(recs))

    r_sample, r_kmeans = recall(sample), recall(trained)
    assert r_kmeans > r_sample, (r_kmeans, r_sample)
    assert r_kmeans >= 0.5  # the k=16/nprobe=4 operating point on this corpus


@pytest.fixture()
def small_idx(spark, tmp_path):
    from victor_spark.index import VectorIndex

    rng = np.random.default_rng(5)
    idx = VectorIndex(spark, str(tmp_path / "kidx"))
    rows = [(f"doc{i}", [float(x) for x in rng.normal(0, 1, 8)], [])
            for i in range(40)]
    idx.insert(rows)
    return idx, rows


def test_build_ivf_with_kmeans_trainer(small_idx):
    idx, rows = small_idx
    idx.build_ivf(n_cells=4, trainer="kmeans", train_iters=5)
    got = idx.search_ivf(rows[7][1], k=3, nprobe=4).collect()
    # nprobe = all cells -> exact: the query's own row must be top-1
    assert got[0]["content"] == "doc7"


def test_build_ivfpq_with_kmeans_trainer(small_idx):
    idx, rows = small_idx
    idx.build_ivfpq(m=2, n_codes=8, n_cells=4, trainer="kmeans", train_iters=5)
    got = idx.search_ivfpq(rows[3][1], k=5, nprobe=4).collect()
    assert len(got) == 5
    assert all(got[i]["adc_dist"] <= got[i + 1]["adc_dist"] for i in range(4))


def test_build_pq_with_kmeans_trainer_lowers_quantization_error(spark, tmp_path):
    """kmeans codebook must reconstruct better than sampled rows. Measured
    on a CLUSTERED corpus (where centroid averaging decisively beats row
    sampling — on isotropic noise the two can land within float jitter of
    each other) over every row's self ADC distance."""
    from victor_spark.index import VectorIndex

    rng = np.random.default_rng(23)
    centers = rng.normal(0, 3, size=(4, 8))
    rows = []
    for i in range(48):
        v = centers[i % 4] + rng.normal(0, 0.4, size=8)
        rows.append((f"doc{i:02d}", [float(x) for x in v], []))
    idx = VectorIndex(spark, str(tmp_path / "pqidx"))
    idx.insert(rows)

    def self_dist():
        return sum(idx.search_pq(v, k=1).first()["adc_dist"]
                   for _c, v, _t in rows[::4])

    # seed_col="content": insert() mints fresh uuids per run, and with
    # the default id seeding BOTH trainers' inits are per-run draws —
    # the sample baseline measured 6.5..27.9 across runs and a lucky
    # draw (codes landing on the probe rows, zeroing their own ADC
    # distance) legitimately beats 8-iter Lloyd on 48 points, while
    # Lloyd itself wandered 10.3..14.5. Content seeding makes both
    # codebooks pure functions of the data, so the comparison is ONE
    # deterministic fact (9.8254 vs 11.9384, identical across
    # re-inserts) instead of a coin flip.
    idx.build_pq(m=2, n_codes=8, trainer="sample", seed_col="content")
    d_sample = self_dist()
    idx.build_pq(m=2, n_codes=8, trainer="kmeans", train_iters=8,
                 seed_col="content")
    d_kmeans = self_dist()
    assert d_kmeans < d_sample, (d_kmeans, d_sample)
    # reproducibility is the claim, not a specific float: re-inserting
    # the same rows must reproduce the content-seeded distance exactly
    # (an absolute constant here would couple the test to the exact
    # float summation/partitioning order — review-caught)
    idx.build_pq(m=2, n_codes=8, trainer="kmeans", train_iters=8,
                 seed_col="content")
    assert self_dist() == d_kmeans


def test_unknown_trainer_rejected(small_idx):
    idx, _ = small_idx
    with pytest.raises(ValueError, match="trainer"):
        idx.build_ivf(n_cells=2, trainer="magic")


def test_fit_kmeans_rejects_empty_input(spark):
    import pytest

    empty = spark.createDataFrame([], "id string, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_kmeans(empty, "id", "v", k=4)


def _mog_rows(n: int = 400, n_clusters: int = 4, dim: int = 16, seed: int = 41):
    """Mixture-of-Gaussians corpus: well-separated cluster DIRECTIONS
    (spherical k-means separates on angle) with small in-cluster noise —
    the corpus shape IVF exists for. The sf* embeddings are near-isotropic
    (recall caps ~0.5 at any centroid quality — SURVEY §8); this fixture
    is the demonstration the probe ratio is FOR."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = c + rng.normal(0, 0.08, size=dim)
        rows.append((f"doc{i:04d}", [float(x) for x in v], []))
    return rows


def test_kmeans_ivf_recall_on_clustered_corpus(spark, tmp_path):
    """The round-3 gap: the isotropic sf corpus caps IVF recall ~0.5, so
    only RELATIVE centroid quality was ever demonstrated. On a clustered
    corpus, kmeans-trained cells align with the clusters and the full
    serving path (build_ivf trainer='kmeans' -> search_ivf) must reach
    recall@10 >= 0.8 while scanning only nprobe/cells = 1/4 of the
    corpus."""
    from victor_spark.index import VectorIndex

    rows = _mog_rows()
    idx = VectorIndex(spark, str(tmp_path / "mogidx"))
    idx.insert(rows)
    idx.build_ivf(n_cells=4, trainer="kmeans", train_iters=8)

    recalls = []
    for _content, v, _t in rows[::40]:  # 10 probe queries across clusters
        exact = {r["id"] for r in idx.search(v, k=10).collect()}
        approx = {r["id"] for r in idx.search_ivf(v, k=10, nprobe=1).collect()}
        recalls.append(len(exact & approx) / 10)
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.8, (mean_recall, recalls)


def test_sampled_centroids_trail_kmeans_on_clustered_corpus(spark, tmp_path):
    """Same corpus, same probe budget: the sampled-row 'codebook' is the
    oracle-replayable default, and this pins the size of the win the
    kmeans trainer buys over it where clustering matters."""
    from victor_spark.index import VectorIndex

    rows = _mog_rows()
    idx = VectorIndex(spark, str(tmp_path / "mogidx2"))
    idx.insert(rows)

    def mean_recall():
        recs = []
        for _c, v, _t in rows[::40]:
            exact = {r["id"] for r in idx.search(v, k=10).collect()}
            appr = {r["id"] for r in idx.search_ivf(v, k=10, nprobe=1).collect()}
            recs.append(len(exact & appr) / 10)
        return float(np.mean(recs))

    idx.build_ivf(n_cells=4, trainer="sample")
    r_sample = mean_recall()
    idx.build_ivf(n_cells=4, trainer="kmeans", train_iters=8)
    r_kmeans = mean_recall()
    assert r_kmeans >= r_sample, (r_kmeans, r_sample)


def test_seed_centroids_zero_vector_pool(spark):
    """Review-caught: under cosine, a zero-norm pool row keeps
    self-distance 1.0 after being chosen (the norm guard leaves it
    all-zeros), so without masking the pick it would be re-chosen until
    every remaining slot is a duplicate centroid. The greedy must still
    produce k DISTINCT pool rows."""
    from victor_spark.operators.kmeans import seed_centroids

    rows = []
    dirs = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    for i in range(30):
        base = dirs[i % 3]
        rows.append((f"id{i:02d}", [x + 0.01 * (i % 5) for x in base]))
    rows.append(("id99", [0.0, 0.0, 0.0]))  # the poison row
    df = spark.createDataFrame(rows, "id string, v array<double>")
    cents = seed_centroids(df, "id", "v", k=4, salt="t", metric="cosine",
                           pool_mult=8)
    assert len(cents) == 4
    # no duplicated centroid (the old bug filled slots with the zero row)
    assert len({tuple(c) for c in cents}) == 4


def test_ivfpq_content_seeding_is_reproducible_across_reinserts(spark, tmp_path):
    """seed_col threads through BOTH ivfpq trainer paths (coarse cells
    and the residual codebook): re-ingesting the identical corpus into a
    fresh index must serve identical ADC distances, which id seeding
    cannot promise (ids are minted per insert)."""
    from victor_spark.index import VectorIndex

    rng = np.random.default_rng(7)
    rows = [(f"d{i:02d}", [float(x) for x in rng.normal(0, 1, 8)], [])
            for i in range(40)]

    def serve(path):
        idx = VectorIndex(spark, path)
        idx.insert(rows)
        idx.build_ivfpq(m=2, n_codes=4, n_cells=2, trainer="kmeans",
                        train_iters=4, seed_col="content")
        return [
            round(r["adc_dist"], 9)
            for r in idx.search_ivfpq(rows[5][1], k=5, nprobe=2).collect()
        ]

    assert serve(str(tmp_path / "a")) == serve(str(tmp_path / "b"))
