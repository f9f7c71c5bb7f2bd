"""Streaming index build: a (content, embedding, tags) stream appended
into a VectorIndex micro-batch by micro-batch.

The reference's inserts are synchronous request/response (db.rs:142-175);
this is the continuous-ingest twin: each micro-batch flows through
``VectorIndex.insert_df`` unchanged, so dimension checks, tag
normalization, quantization, the projected-insert path, and the tag-set
metadata listing all apply per batch. Append-only parquet makes the write
idempotent-friendly: a replayed batch appends duplicate ROWS (new uuids),
which is the reference's semantics too — dedup is an upstream concern
(see dedup_stream for the screening topology).

At scale each micro-batch pays one partitioned append plus the bounded
validation pass; the tag-set listing update is a driver-side
read-modify-write of a few hundred rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from victor_spark.index import VectorIndex


def stream_index_ingest(doc_stream: DataFrame, index: VectorIndex,
                        checkpoint_dir: str,
                        available_now: bool = True) -> StreamingQuery:
    """Append every micro-batch of ``doc_stream`` — columns (content,
    embedding, tags) — into ``index`` via insert_df."""

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        index.insert_df(batch)

    writer = (
        doc_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_chunked_ingest(doc_stream: DataFrame, index: VectorIndex,
                          id_col: str, text_col: str,
                          checkpoint_dir: str,
                          chunk_size: int = 16, overlap: int = 4,
                          tags: list[str] | None = None,
                          available_now: bool = True) -> StreamingQuery:
    """Continuous RAG ingestion: each micro-batch of raw documents flows
    through ``VectorIndex.add_chunked`` — chunk (map-side explode) →
    embed (Arrow pandas_udf) → partitioned append — so the index grows
    chunk-by-chunk as documents arrive, every chunk carrying its
    ``doc:<id>`` provenance tag. The batch path and this stream are the
    SAME code; stream == batch follows from determinism of the chunker
    and embedder, and is asserted in tests/test_streaming.py."""

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        index.add_chunked(batch, id_col, text_col,
                          chunk_size=chunk_size, overlap=overlap, tags=tags)

    writer = (
        doc_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
