"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in victor_spark/plans/catalog.py — every entry is
a (Spark builder, DuckDB oracle) pair built on the same deterministic
primitives; see that module's docstring for the parity rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from victor_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top-10 cosine search over
    the embeddings table (the reference's hot path, db.rs:217-283)."""
    return QUERIES["topk_cosine"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    The driver runs these at sf=0.01; dynamic oracles (deterministic
    driver-side computations whose result the SQL states literally, e.g.
    the BPE merge table) are resolved against the same data here.
    """
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return {
        name: spec.oracle_sql(sf_dir)
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
