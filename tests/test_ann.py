"""ANN operators: brute force exactness + LSH recall on clustered data."""

from __future__ import annotations

import math
import random

from victor_spark.operators import ann


def _clustered(spark, n_per=20, d=16, seed=3):
    """Two tight clusters around orthogonal centers."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_per):
        rows.append((i, [1.0 + rng.gauss(0, 0.01) if j == 0 else rng.gauss(0, 0.01) for j in range(d)]))
        rows.append((100 + i, [1.0 + rng.gauss(0, 0.01) if j == 1 else rng.gauss(0, 0.01) for j in range(d)]))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_brute_force_topk_exact(spark):
    df = _clustered(spark)
    q = [1.0] + [0.0] * 15
    hits = ann.brute_force_topk(df, "v", q, k=5, metric="cosine").collect()
    assert len(hits) == 5
    assert all(h["vec_id"] < 100 for h in hits)  # all from cluster 0
    assert all(hits[i]["score"] >= hits[i + 1]["score"] for i in range(4))


def test_brute_force_euclidean_ascending(spark):
    df = _clustered(spark)
    q = [0.0, 1.0] + [0.0] * 14
    hits = ann.brute_force_topk(df, "v", q, k=5, metric="euclidean").collect()
    assert all(h["vec_id"] >= 100 for h in hits)
    assert all(hits[i]["score"] <= hits[i + 1]["score"] for i in range(4))


def test_batch_topk_per_query(spark):
    df = _clustered(spark)
    queries = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 15), (1, [0.0, 1.0] + [0.0] * 14)],
        "qid long, qv array<double>",
    )
    res = ann.batch_topk(df, queries, "vec_id", "v", "qid", "qv", k=3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q[0]) == 3 and len(by_q[1]) == 3
    assert all(r["corpus_id"] < 100 for r in by_q[0])
    assert all(r["corpus_id"] >= 100 for r in by_q[1])


def test_lsh_topk_recall_on_clusters(spark):
    df = _clustered(spark)
    q = [1.0] + [0.0] * 15
    exact = {r["vec_id"] for r in ann.brute_force_topk(df, "v", q, k=5).collect()}
    approx = {r["vec_id"] for r in ann.lsh_topk(df, "v", q, k=5, num_planes=6).collect()}
    # tight cluster ⇒ all true neighbors share the query's bucket
    assert len(exact & approx) >= 4


# ---------------------------------------------------------------------------
# product quantization + ADC (operators/pq.py)
# ---------------------------------------------------------------------------

from victor_spark.operators import pq


def test_pq_codebook_deterministic(spark):
    df = _clustered(spark)
    cb1 = pq.codebook_vectors(df, "vec_id", "v", k=4)
    cb2 = pq.codebook_vectors(df, "vec_id", "v", k=4)
    assert cb1 == cb2
    assert len(cb1) == 4 and all(len(c) == 16 for c in cb1)


def test_pq_encode_shape_and_range(spark):
    df = _clustered(spark)
    cb = pq.codebook_vectors(df, "vec_id", "v", k=4)
    enc = pq.encode(df, "v", cb, m=4)
    rows = enc.select("pq_code").collect()
    assert all(len(r["pq_code"]) == 4 for r in rows)
    assert all(1 <= c <= 4 for r in rows for c in r["pq_code"])


def test_pq_codebook_row_encodes_to_itself(spark):
    """A vector that IS a codebook row must get its own index in every
    subvector (distance 0 is the unique minimum on distinct rows)."""
    df = _clustered(spark)
    cb = pq.codebook_vectors(df, "vec_id", "v", k=4)
    cb_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cb)], "vec_id long, v array<double>"
    )
    enc = {r["vec_id"]: r["pq_code"] for r in pq.encode(cb_df, "v", cb, m=4).collect()}
    for i in range(4):
        assert enc[i] == [i + 1] * 4, enc


def test_pq_adc_matches_exact_on_codebook_rows(spark):
    """ADC distance to a codebook row equals the exact squared L2, because
    the row reconstructs losslessly; and top-1 for a near-centroid query is
    the centroid itself."""
    df = _clustered(spark)
    cb = pq.codebook_vectors(df, "vec_id", "v", k=4)
    enc = pq.encode(df.limit(0).unionByName(
        spark.createDataFrame([(999, cb[0])], "vec_id long, v array<double>")
    ), "v", cb, m=4)
    hit = pq.adc_topk(enc, cb[0], cb, k=1, m=4).collect()[0]
    assert hit["vec_id"] == 999
    assert abs(hit["adc_dist"]) < 1e-12


def test_pq_adc_ranking_respects_clusters(spark):
    """With one codebook row per cluster, ADC ranks same-cluster vectors
    strictly closer than cross-cluster ones."""
    df = _clustered(spark)
    cb = pq.codebook_vectors(df, "vec_id", "v", k=8)
    enc = pq.encode(df, "v", cb, m=4)
    q = [1.0] + [0.0] * 15
    hits = pq.adc_topk(enc, q, cb, k=10, m=4).collect()
    assert all(h["vec_id"] < 100 for h in hits)
    assert all(hits[i]["adc_dist"] <= hits[i + 1]["adc_dist"] for i in range(9))


def test_ivfpq_topk_shape_and_determinism(spark):
    from victor_spark.operators.ivfpq import collect_ivfpq_model, ivfpq_topk
    from victor_spark.plans.catalog import _emb
    from tests.conftest import SF_SMOKE

    e = _emb(spark, SF_SMOKE).select("vec_id", "v")
    out = ivfpq_topk(e, "vec_id", "v", query_id=7, k=5).collect()
    assert len(out) == 5
    # ascending ADC distance, deterministic tie-break
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)
    assert out == ivfpq_topk(e, "vec_id", "v", query_id=7, k=5).collect()
    # every hit comes from a probed cell and the model artifacts line up
    cents, cb, q = collect_ivfpq_model(e, "vec_id", "v", 7)
    assert len(cb) == 16 and len(q) == 64
    assert all(r["cell"] in cents for r in out)


def test_assign_cells_fold_matches_crossjoin_reference(spark):
    """The round-11 map-side assign_cells fold must reproduce the old
    broadcast-crossJoin + max_by(cell, struct(cs, -cell)) argmax exactly —
    including tie-breaks (duplicate centroids → lowest cell) and zero-norm
    rows (NaN cosine against every centroid → first/lowest cell under
    Spark's NaN-greatest ordering, same as max_by)."""
    from pyspark.sql import functions as F

    from victor_spark.functions.vector import cosine
    from victor_spark.operators.ivfpq import assign_cells

    df = _clustered(spark)
    # adversarial rows: a zero-norm vector and an exact duplicate of a
    # centroid (ties across the duplicate centroids below)
    extra = spark.createDataFrame(
        [(900, [0.0] * 16), (901, [1.0] + [0.0] * 15)],
        "vec_id long, v array<double>",
    )
    df = df.unionAll(extra)
    centroids = {
        0: [1.0] + [0.0] * 15,
        5: [0.0, 1.0] + [0.0] * 14,
        7: [1.0] + [0.0] * 15,  # duplicate of cell 0 → ties break to 0
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(df, "vec_id", "v", centroids).collect()
    }
    # reference: the pre-round-11 crossJoin + max_by shape, inlined
    cent_df = F.broadcast(spark.createDataFrame(
        [(c, v) for c, v in sorted(centroids.items())],
        "cell long, _cv array<double>",
    ))
    ref = {
        r["vec_id"]: r["cell"]
        for r in df.crossJoin(cent_df)
        .select("vec_id", "cell", cosine(F.col("v"), "_cv").alias("_cs"))
        .groupBy("vec_id")
        .agg(F.max_by("cell", F.struct(F.col("_cs"), -F.col("cell"))).alias("cell"))
        .collect()
    }
    assert got == ref
    assert got[901] == 0  # duplicate-centroid tie broke to the lowest cell
