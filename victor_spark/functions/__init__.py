from victor_spark.functions import hashing, text, vector

__all__ = ["vector", "hashing", "text"]
