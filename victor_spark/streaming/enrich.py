"""Streaming as-of enrichment: an event stream joined as-of against a
static (slowly-changing) reference table.

The classic use: tag each arriving event with the most recent state row
at or before its timestamp — last deploy, last config change, last error
per key. The reference has no streaming at all (its API is synchronous
request/response, /root/reference/src/db.rs); this is the streaming twin
of ``operators/asof.py``.

Spark's native stream-stream joins can't express "latest right row ≤ ts"
(that's a window, and non-time windows are unsupported on streams), so
the shape is ``foreachBatch``: each micro-batch is a plain DataFrame and
the BATCH as-of operator applies unchanged — same union + last-ignorenulls
window, one shuffle per micro-batch, right side re-read each batch so
reference-table updates between batches are picked up without restart.

At scale the per-batch cost is the batch operator's cost on the batch's
rows plus a scan of the right table; when the right side is small it
broadcasts into the window union like any dim.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.asof import asof_join


def stream_asof_enrich(event_stream: DataFrame, right: DataFrame,
                       on: list[str],
                       sink: Callable[[DataFrame, int], None],
                       checkpoint_dir: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       suffix: str = "_right",
                       available_now: bool = True) -> StreamingQuery:
    """Enrich each micro-batch of ``event_stream`` with the latest ``right``
    row per key at or before the event time; call ``sink(result_df,
    epoch_id)`` with the batch as-of join output (same schema as
    :func:`victor_spark.operators.asof.asof_join`)."""

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        sink(asof_join(batch, right, on, left_ts, right_ts, suffix), epoch_id)

    writer = (
        event_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
