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


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write as JSON Lines (one object per row). ``compression`` enables
    a codec ('gzip', 'bzip2', 'zstd', ... — whatever the Spark build
    carries); .jsonl.gz is THE training-corpus interchange format, and
    read_jsonl decompresses it transparently by extension. Scale note:
    gzip shards are NOT splittable — one task reads one shard — so the
    parallelism of every downstream consumer is the shard count; write
    with enough partitions (or use zstd/bzip2, which split)."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


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


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a raw .txt corpus — one DOCUMENT PER FILE — as (doc_id, source,
    text): the standard entry point for scraped/text-dump training data.

    ``wholetext`` keeps each file one row (a document is a file; corpora
    with many documents per file should ship JSONL — see read_jsonl).
    ``doc_id`` is the 64-bit xxhash of the file path: deterministic across
    runs, cluster sizes, and listing order, unlike
    monotonically_increasing_id — and wide enough that collisions stay
    negligible at millions of shards (32 bits would hit the birthday bound
    around 65k files). Scaling is by file count — at 100 TB the input is
    millions of shards and every executor reads its own; note wholetext
    makes a file's full contents one task's memory, so shard size, not
    corpus size, bounds memory.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source"), F.col("value").alias("text")
    )
    return raw.select(
        F.xxhash64("source").alias("doc_id"),
        "source",
        "text",
    )


def write_text_lines(df: DataFrame, path: str, text_col: str = "text",
                     mode: str = "overwrite") -> None:
    """Write one text column as raw .txt shards, one LINE per document.

    Lossless escaping so the shards stay line-splittable: backslash first
    (so escapes are unambiguous), then newline and carriage return (Hadoop
    line readers split on BOTH). :func:`read_text_lines` reverses it.
    """
    out = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), r"\\", r"\\\\"),
                "\n", r"\\n",
            ),
            "\r", r"\\r",
        ).alias("value")
    )
    out.write.mode(mode).text(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read shards written by :func:`write_text_lines`: one document per
    line, reversing the escape losslessly.

    Decode without lookbehind gymnastics: in the encoded form every
    literal backslash is the PAIR ``\\\\``, so splitting on pairs leaves
    pieces where any remaining backslash unambiguously introduces ``\\n``
    or ``\\r`` — unescape those per piece, rejoin with one backslash."""
    pieces = F.split(F.col("value"), r"\\\\", -1)
    decoded = F.array_join(
        F.transform(
            pieces,
            lambda p: F.regexp_replace(
                F.regexp_replace(p, r"\\n", "\n"), r"\\r", "\r"
            ),
        ),
        "\\",
    )
    return spark.read.text(path).select(decoded.alias("text"))


# backwards-compatible alias for the original (newline-only) writer name
write_text_corpus = write_text_lines
