"""Interchange formats beyond parquet: JSONL and CSV.

Training-data pipelines exchange corpora as JSON Lines (one document per
line) and occasionally CSV; Spark's readers parallelize both by file split,
so ingest scales with the number of input files (at 100 TB the input is
thousands of shards and every executor reads its own). Schemas are always
passed explicitly on read — schema inference re-reads the whole input a
first time, which is a full extra pass at scale, and silently widens types.

JSONL is Spark's native JSON mode (each line one object). CSV cannot carry
nested types, so array columns (tags, embeddings) are serialized to JSON
strings on write and parsed back on read — a documented, lossless
round-trip for the standard (string, array<string>, array<double>) corpus
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSON Lines with an explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSON Lines (one object per row; splittable shards)."""
    df.write.mode(mode).json(path)


def _array_cols(schema: StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, ArrayType)]


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write CSV with a header; array columns become JSON strings."""
    out = df
    for name in _array_cols(df.schema):
        out = out.withColumn(name, F.to_json(F.col(name)))
    out.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read CSV written by :func:`write_csv` back to the given schema.

    `schema` is the LOGICAL schema (arrays included); the physical CSV
    holds those columns as JSON strings and they are parsed back here.
    """
    from pyspark.sql.types import _parse_datatype_string

    target = schema if isinstance(schema, StructType) else _parse_datatype_string(schema)
    physical = StructType(
        [
            StructField(f.name, StringType(), f.nullable)
            if isinstance(f.dataType, ArrayType)
            else f
            for f in target.fields
        ]
    )
    df = spark.read.schema(physical).option("header", "true").csv(path)
    for f in target.fields:
        if isinstance(f.dataType, ArrayType):
            df = df.withColumn(f.name, F.from_json(F.col(f.name), f.dataType))
    return df.select(*[f.name for f in target.fields])


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (columnar like parquet: self-describing schema, predicate
    pushdown and column pruning apply — no inference pass needed)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC — the interchange columnar format for Hive/Trino-side
    consumers; carries nested types (arrays) natively, unlike CSV."""
    df.write.mode(mode).orc(path)
