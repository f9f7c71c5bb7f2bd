"""Clustered (mixture-of-Gaussians) embeddings fixture + ANN recall probe.

The driver's sf* embeddings are near-isotropic — the HARD case for IVF,
where recall@10 caps around 0.5 at any centroid quality (SURVEY §8).
This tool manufactures the corpus shape the probe ratio exists FOR:
well-separated cluster directions with small in-cluster noise, written
as a testdata-compatible ``embeddings.parquet``, then runs the catalog's
``ann_recall`` audit over it and prints the per-method recalls.

    python tools/make_clustered_embeddings.py /tmp/testdata_clustered

Results go in SCALING.md next to the isotropic numbers — the pair shows
the audit measuring corpus clusterability, not a broken operator.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_embeddings(out_dir: str, n: int = 2000, n_clusters: int = 7,
                    dim: int = 64, seed: int = 41) -> str:
    """7 clusters: coprime with ann_recall's every-250th-vector centroid
    rule, so the deterministic sample seeds EVERY cluster (8 would leave
    the odd clusters centroid-less — an artifact of the modulus, not a
    property of the corpus)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.empty((n, dim), dtype=np.float32)
    labels = np.empty(n, dtype=np.int64)
    for i in range(n):
        c = i % n_clusters
        vecs[i] = centers[c] + rng.normal(0, 0.08, size=dim)
        labels[i] = c
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    papq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "label": pa.array(labels, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }),
        path,
    )
    return path


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_clustered"
    make_embeddings(out)

    from victor_spark.plans.catalog import QUERIES
    from victor_spark.session import get_spark

    spark = get_spark("clustered_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = QUERIES["ann_recall"].build(spark, out).collect()
    for r in rows:
        print(f"{r['method']:>8}  recall@10 = {r['recall']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
