"""victor_spark — a PySpark-native analytics engine with the query surface of
not-pizza/victor (browser vector DB), rebuilt Spark-first for 100 TB scale.

Parity surface (see SURVEY.md §2): batch insert of (content, embedding, tags)
rows, top-k nearest-neighbor search by cosine (euclidean in PCA-projected
mode) with tag-superset filtering, 8-bit scalar quantization, PCA
dimensionality reduction.

Extensions (SURVEY.md §7 / BASELINE.json north star): deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (lang-id, quality, tokens,
fingerprints), multimodal binary-column plumbing, streaming ingest.

Everything is expressed as declarative DataFrame plans so Catalyst handles
pushdown/pruning/broadcast; Python UDFs appear only where semantics require
(multimodal decode stubs).
"""

from victor_spark.session import get_spark


def __getattr__(name):
    # lazy so `import victor_spark` stays light; the index pulls in the
    # full operator surface
    if name == "VectorIndex":
        from victor_spark.index import VectorIndex

        return VectorIndex
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = ["get_spark", "VectorIndex", "__version__"]
