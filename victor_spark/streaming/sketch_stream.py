"""Streaming distinct-count rollup: a persistent HyperLogLog register
table maintained across micro-batches.

The production loop this models: values (user ids, URLs, shingles)
arrive continuously, and the pipeline keeps a live "distinct so far"
estimate without ever re-reading history. The state is the HLL register
table — 2^p rows, CONSTANT-SIZE no matter how much data has flowed —
and the per-batch update is the sketch's own merge algebra
(element-wise max, ``operators/sketches.py::hll_merge``): exactly the
property that makes an HLL maintainable incrementally where an exact
``count(DISTINCT)`` would need unbounded state.

Shape: ``foreachBatch``. The state is a cross-batch-persistent parquet
artifact the BATCH side also reads (the daily-rollup integration point),
which is foreachBatch territory; ``applyInPandasWithState`` would trap
the registers inside the streaming checkpoint. The micro-batch cost is
one map-side (bucket, rho) projection + a 2^p-row merge; the state swap
is a bounded 2^p-row rewrite (the same sanctioned model-artifact scale
as the PQ codebook collects).

Restart semantics: the checkpoint replays unacknowledged batches; the
update is idempotent (max is), so replayed batches cannot inflate the
estimate — the classic reason sketches are the streaming-safe form of
distinct counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_prepare,
    hll_registers,
)
from victor_spark.streaming.state import read_state, write_state

_STATE_SCHEMA = "bucket long, r int"


def stream_distinct_rollup(
    values: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    p: int = 10,
    salt: str = "hll",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``state_dir`` as the HLL register table of every value of
    ``col`` seen on the stream so far. ``distinct_estimate`` reads it.

    The swap materializes the merged 2^p-row table driver-side before
    overwriting (reading and overwriting the same path in one plan is a
    lost-data race; 2^p rows is a bounded artifact, not a data collect).
    """
    spark = values.sparkSession

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        regs = hll_registers(hll_prepare(batch, col, p=p, salt=salt), p=p)
        prev = read_state(spark, state_dir, _STATE_SCHEMA)
        if prev is not None:
            regs = hll_merge(prev, regs)
        rows = regs.collect()
        # crash-safe swap (streaming/state.py): the register history is
        # never lost to a partial overwrite
        write_state(spark.createDataFrame(rows, _STATE_SCHEMA), state_dir)

    writer = (
        values.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def distinct_estimate(
    spark: SparkSession, state_dir: str, p: int = 10, correct: bool = True
) -> float:
    """The live estimate from the persisted register table."""
    state = read_state(spark, state_dir, _STATE_SCHEMA)
    if state is None:
        return 0.0
    # densify in case a legacy/partial writer dropped empty buckets
    m = 1 << p
    spine = spark.range(m).select(F.col("id").alias("bucket"))
    dense = spine.join(state, "bucket", "left").select(
        "bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r")
    )
    return float(hll_estimate(dense, p=p, correct=correct).collect()[0]["estimate"])
