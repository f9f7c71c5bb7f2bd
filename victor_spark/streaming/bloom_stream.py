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
OR'd in before the next batch probes, so in failure-free operation a
key is emitted as new at most once across the stream's lifetime.
Under failures the guarantee narrows to the window described below.

Restart semantics: the checkpoint replays unacknowledged batches; the
OR update is idempotent, so replays cannot corrupt the filter. The
emission contract under failure depends on WHERE the crash lands: a
crash AFTER the state write replays the batch against a filter that
already contains its keys, so they test as seen and are not re-emitted
— at-most-once holds for that (common) window. A crash after sink()
but BEFORE the state write replays the batch against the pre-batch
filter and re-emits the same keys as new — that window is
at-least-once unless the sink is idempotent (keyed upserts make it
exactly-once end to end). The state write itself is crash-safe
(streaming/state.py): an interrupted swap heals on the next read
instead of wedging the query on a partial directory.
"""

from __future__ import annotations

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
from victor_spark.streaming.state import read_state, write_state

_STATE_SCHEMA = "words array<bigint>"


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

    NULL keys are flagged ``seen=True`` (conservative: a null key is not
    a crawlable URL, and both the probe and the filter build would
    otherwise silently skip it — it would read as neither-new-nor-seen
    and re-surface every batch, voiding the at-most-once contract;
    review-caught). The batch may not already carry a ``seen`` column —
    the output column would be ambiguous.
    """
    spark = keys.sparkSession

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        # reserved output/state aliases, checked on EVERY path (the
        # __bloom_words guard used to run only when state existed)
        for reserved in ("seen", "__bloom_words"):
            if reserved in batch.columns:
                raise ValueError(
                    f"batch may not contain a {reserved!r} column"
                )
        prev = read_state(spark, state_dir, _STATE_SCHEMA)
        if prev is not None:
            rows = prev.collect()
            words_df = (
                spark.createDataFrame([(rows[0]["words"],)], _STATE_SCHEMA)
                if rows else None  # empty state frame == no state
            )
        else:
            words_df = None
        if words_df is not None:
            # the filter row rides under a reserved alias so a batch
            # column named "words" is neither shadowed nor clobbered
            payload = F.broadcast(
                words_df.select(F.col("words").alias("__bloom_words"))
            )
            flagged = batch.crossJoin(payload).select(
                *batch.columns,
                F.when(F.col(col).isNull(), F.lit(True))
                .otherwise(
                    bloom_might_contain(
                        F.col("__bloom_words"), F.col(col), k=k, m=m,
                        salt=salt,
                    )
                )
                .alias("seen"),
            )
        else:
            flagged = batch.select(
                *batch.columns,
                # null keys are "seen" even on the stateless first batch
                F.col(col).isNull().alias("seen"),
            )
        sink(flagged, epoch_id)
        fresh = bloom_build(batch, col, k=k, m=m, salt=salt)
        merged = fresh if words_df is None else bloom_merge(words_df, fresh)
        rows = merged.collect()  # one row, m/32 longs — bounded artifact
        write_state(
            spark.createDataFrame(rows, _STATE_SCHEMA), state_dir
        )

    writer = (
        keys.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
