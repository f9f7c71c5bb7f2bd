"""Continuous vector search: a query stream against a static index.

The reference's search is one request at a time (db.rs:217-283); the
streaming twin serves a *feed* of query vectors (an application event bus,
an embedding service's output topic) against the current index snapshot.

Shape: stream-static join via ``foreachBatch`` — each micro-batch of
queries is a small DataFrame, so the batch per-query top-k operator
(`operators/topk.py::topk_per_group`, the same code the batch catalog
query uses) applies unchanged: broadcast the micro-batch of queries,
score map-side over the corpus scan, one window shuffle for the per-query
rank. The corpus is never shuffled and is re-scanned per micro-batch,
which is exactly the semantics a "search the index as of now" stream
wants — inserts landing between micro-batches are visible to the next
batch without restart.

At scale the per-micro-batch cost is the same as one batch query-set
search; throughput tunes with the trigger interval (bigger batches
amortize the corpus scan over more queries).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from victor_spark.functions.vector import cosine
from victor_spark.operators.topk import topk_per_group


def search_microbatch(queries: DataFrame, corpus: DataFrame, k: int,
                      query_id: str = "query_id", query_vec: str = "qv",
                      corpus_id: str = "vec_id", corpus_vec: str = "v") -> DataFrame:
    """Per-query top-k cosine results for one (micro-)batch of queries.

    Pure batch logic — usable directly, and as the foreachBatch body of
    :func:`stream_search`. Returns (query_id, vec_id, score, rank).
    """
    scored = corpus.crossJoin(
        F.broadcast(queries.select(F.col(query_id), F.col(query_vec)))
    ).select(
        query_id,
        corpus_id,
        cosine(corpus_vec, query_vec).alias("score"),
    )
    return topk_per_group(
        scored, group_cols=[query_id], score_col="score", k=k,
        tie_cols=[corpus_id],
    )


def stream_search(query_stream: DataFrame, corpus: DataFrame, k: int,
                  sink: Callable[[DataFrame, int], None],
                  checkpoint_dir: str,
                  query_id: str = "query_id", query_vec: str = "qv",
                  corpus_id: str = "vec_id", corpus_vec: str = "v",
                  available_now: bool = True) -> StreamingQuery:
    """Run the query stream against the (static) corpus; call `sink` with
    each micro-batch's top-k results.

    `sink(results_df, epoch_id)` receives the same schema as
    :func:`search_microbatch`. With ``available_now`` the backlog drains
    and the query stops — the batch-parity mode the tests use; without it
    the stream serves continuously.
    """

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        sink(search_microbatch(batch, corpus, k, query_id, query_vec,
                               corpus_id, corpus_vec), epoch_id)

    writer = (
        query_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
