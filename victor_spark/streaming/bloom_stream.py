"""Streaming seen-before screen: a persistent Bloom filter maintained
across micro-batches — the crawler's URL-dedup loop.

The production shape: keys (URLs, doc ids, content hashes) arrive
continuously and each batch must be split into never-seen vs
seen-before WITHOUT an ever-growing exact key store. The state is the
packed Bloom word array (`operators/sketches.py`): CONSTANT-SIZE no
matter how many keys have flowed, probed map-side per batch, updated by
the filter's own merge algebra (word-wise OR).

Semantics are the Bloom contract, stated honestly: "seen" can
false-positive (a truly new key dropped at ~fill^k rate — the price of
bounded state; size m for the expected corpus), "new" never
false-negatives AGAINST THE FILTER — every key admitted as new is
immediately OR'd in, so a key can be emitted as new at most once
across the stream's lifetime, replay included.

Restart semantics: the checkpoint replays unacknowledged batches; the
OR update is idempotent, so replays cannot corrupt the filter. A
replayed batch re-probes the filter AFTER its own keys were merged, so
its keys test as seen and are not re-emitted — at-most-once emission of
"new" keys survives restarts, which an exact-set screen only achieves
with transactional state.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.sketches import (
    BLOOM_K,
    BLOOM_M,
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)

_STATE_SCHEMA = "words array<bigint>"


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if not os.path.isdir(state_dir):
        return None
    return spark.read.schema(_STATE_SCHEMA).parquet(state_dir)


def stream_seen_filter(
    keys: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    k: int = BLOOM_K,
    m: int = BLOOM_M,
    salt: str = "bf",
    available_now: bool = True,
) -> StreamingQuery:
    """Per micro-batch, call ``sink(df, epoch_id)`` with the batch rows
    plus a boolean ``seen`` column (probed against the filter state
    BEFORE this batch), then fold the batch's keys into the state.

    Within one batch, duplicate keys all probe the same pre-batch state
    (they are reported with the same ``seen`` flag); cross-batch,
    at-most-once "new" emission holds per the module contract.
    """
    spark = keys.sparkSession

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        prev = _read_state(spark, state_dir)
        if prev is not None:
            w = prev.collect()[0]["words"]
            words_df = spark.createDataFrame([(w,)], _STATE_SCHEMA)
        else:
            words_df = None
        if words_df is not None:
            flagged = batch.crossJoin(F.broadcast(words_df)).select(
                *batch.columns,
                bloom_might_contain(
                    F.col("words"), F.col(col), k=k, m=m, salt=salt
                ).alias("seen"),
            )
        else:
            flagged = batch.select(*batch.columns, F.lit(False).alias("seen"))
        sink(flagged, epoch_id)
        fresh = bloom_build(batch, col, k=k, m=m, salt=salt)
        merged = fresh if words_df is None else bloom_merge(words_df, fresh)
        rows = merged.collect()  # one row, m/32 longs — bounded artifact
        spark.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    writer = (
        keys.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
