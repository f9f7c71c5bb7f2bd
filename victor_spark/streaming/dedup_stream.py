"""Streaming incremental near-dup detection: a document stream checked
against the static (already-ingested) corpus, micro-batch by micro-batch.

The production loop this models: documents arrive continuously; before a
batch is admitted into the corpus, every doc in it is screened for
near-duplicates of what the corpus already holds (plus exact-dup screening
inside the batch itself). The reference has no streaming; this is the
streaming twin of ``operators/dedup.py::incremental_near_duplicates``,
which the batch side of a pipeline runs nightly.

Shape: ``foreachBatch`` — MinHash banding needs set-valued state (the
corpus band table) and a broadcast join per batch, which is exactly the
batch operator; streaming-native stateful APIs add nothing here. Each
micro-batch pays: signature of the batch (map-side), broadcast of its
banded signatures, one map-side scan of the corpus band table. At 100 TB
the corpus band table is the precomputed ingest artifact the batch
operator already documents; micro-batches ride the same join.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from victor_spark.operators.dedup import incremental_near_duplicates


def stream_incremental_dedup(doc_stream: DataFrame, corpus: DataFrame,
                             id_col: str, content_col: str,
                             sink: Callable[[DataFrame, int], None],
                             checkpoint_dir: str,
                             threshold: float = 0.7, num_hashes: int = 16,
                             bands: int = 8, shingle_n: int = 3,
                             unit: str = "word",
                             available_now: bool = True) -> StreamingQuery:
    """For each micro-batch of ``doc_stream``, call ``sink(pairs_df,
    epoch_id)`` where ``pairs_df`` is (batch_id, corpus_id, jaccard) — the
    batch docs that near-duplicate the static ``corpus`` (same semantics
    and columns as the batch operator)."""

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        sink(
            incremental_near_duplicates(
                corpus, batch, id_col, content_col,
                threshold=threshold, num_hashes=num_hashes, bands=bands,
                shingle_n=shingle_n, unit=unit,
            ),
            epoch_id,
        )

    writer = (
        doc_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
