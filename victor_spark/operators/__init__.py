from victor_spark.operators import ann, dedup, multimodal, pca, topk

__all__ = ["topk", "dedup", "ann", "pca", "multimodal"]
