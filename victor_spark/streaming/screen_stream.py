"""Streaming contamination screen: the eval-prompt gate as a Structured
Streaming topology (the 21st).

The batch plane's ``sft_contamination_screen`` (plans/catalog_r12.py) is
a REPORT — top offenders by shared-shingle count. Production also needs
the GATE form: conversation-shaped rows arriving continuously (an SFT
data vendor drop, a synthetic-generation pipeline's output) are screened
against a FROZEN eval-prompt shingle set BEFORE they reach the training
lake, so a contaminated batch never lands. Screening is STATELESS per
row (frozen bench + the row's own content), so this is the straight-pipe
shape of topology 19: ``readStream`` → the same shingle-hash +
broadcast-intersect arithmetic the batch operator uses
(operators/contamination.py) → ``writeStream`` append with a
``contaminated`` flag column; the sink side routes on the flag. No
watermark, no state store; stream == batch holds exactly (asserted in
tests/test_streaming.py).

Scale: the bench side collapses to ONE broadcast array row (the
documented ngram_overlap_small_bench ceiling, ~10M distinct shingles);
the stream side is a pure narrow map, so at 100 TB/day the knobs are
source file sizing — the same as every straight-pipe topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from victor_spark.functions import hashing as H


def screen_conversations(
    docs: DataFrame,
    bench: DataFrame,
    content_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Append ``n_shingles``, ``n_shared``, ``contaminated`` to a
    conversation-shaped relation — batch or streaming.

    ``bench`` must be a STATIC DataFrame carrying ``content_col`` (the
    frozen eval prompts); its distinct shingle hashes collapse to one
    broadcast array row, exactly the batch operator's
    ``ngram_overlap_small_bench`` shape — but every input row is KEPT
    and flagged (a gate routes on the flag; the batch catalog query's
    filter/top-20 is the reporting shape). Cache ``bench`` upstream if
    the stream runs many micro-batches — the static side is re-planned
    per batch otherwise."""
    clash = {"n_shingles", "n_shared", "contaminated"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"screen_conversations input columns {sorted(clash)} collide "
            "with the screen output columns — rename them upstream"
        )
    h = H.shingle_hashes(content_col, shingle_n, "word")
    bench_arr = (
        bench.select(F.explode(h).alias("bh"))
        .agg(F.collect_set("bh").alias("__bl"))
        .withColumn("__k", F.lit(1))
    )
    return (
        docs.withColumn("n_shingles", F.size(h).cast("int"))
        .withColumn("__h", h)
        .withColumn("__k", F.lit(1))
        # left join: an EMPTY bench screens nothing but must not drop
        # rows (stream-static equi-join on the dummy key — Structured
        # Streaming supports stream-static joins; a crossJoin does not
        # carry a join condition and is rejected on streams)
        .join(F.broadcast(bench_arr), "__k", "left")
        .withColumn(
            "n_shared",
            F.coalesce(
                F.size(F.array_intersect("__h", "__bl")), F.lit(0)
            ).cast("long"),
        )
        .withColumn("contaminated", F.col("n_shared") >= 1)
        .drop("__h", "__k", "__bl")
    )


def stream_screened_conversations(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    bench: DataFrame,
    content_col: str = "text",
    shingle_n: int = 3,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously screen conversation-shaped parquet landing under
    ``src_dir`` against the frozen ``bench`` prompts, appending flagged
    rows at ``out_dir``. Schema pinned to the landing table's own files
    (the topology-19 discipline: upstream drift fails loudly)."""
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(src_dir)
    out = screen_conversations(
        docs, bench, content_col=content_col, shingle_n=shingle_n
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
