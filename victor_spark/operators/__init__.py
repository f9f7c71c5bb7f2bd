from victor_spark.operators import (
    ann,
    asof,
    contamination,
    dedup,
    multimodal,
    packing,
    pca,
    pq,
    ranges,
    sampling,
    topk,
)

__all__ = [
    "topk",
    "dedup",
    "ann",
    "pq",
    "pca",
    "multimodal",
    "asof",
    "ranges",
    "packing",
    "sampling",
    "contamination",
]
