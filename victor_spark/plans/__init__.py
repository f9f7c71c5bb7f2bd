from victor_spark.plans.catalog import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
