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
