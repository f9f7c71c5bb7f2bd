"""Sequence packing: assign documents to fixed-length training sequences.

Extension operator (the reference has no batch/layout machinery at all —
its write path is one tag-set file per insert, /root/reference/src/db.rs:
473-556); this is the training-data-pipeline op the brief calls for.

The standard LLM pretraining layout concatenates tokenized documents into
one stream and chunks it every ``seq_len`` tokens (GPT-style
concat-then-chunk; docs may straddle a chunk boundary). The assignment —
which pack a document starts in, and at what offset — is a running sum
over a deterministic document order.

A single global running sum is the textbook anti-pattern at scale: one
window over an unpartitioned ORDER BY collapses 100 TB onto one task. So
the operator packs within ``n_buckets`` independent streams, where a
document's bucket is a salted hash of its id: each bucket is an
independent window partition (one shuffle by bucket, all buckets pack in
parallel), and n_buckets scales with the cluster. Training jobs read
(bucket, pack_id) as the shard key. Deterministic end-to-end — same
corpus, same assignment, on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from victor_spark.functions import hashing as H


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    n_buckets: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign each row to its pack: adds ``bucket``, ``start_off`` (token
    offset of the doc inside its bucket's concatenated stream), and
    ``pack_id`` (= start_off div seq_len — the chunk the doc starts in).

    Document order inside a bucket is (salted md5 of id, id) — stable and
    engine-reproducible; empty docs (0 tokens) keep a well-defined slot.
    """
    if seq_len <= 0 or n_buckets <= 0:
        raise ValueError("seq_len and n_buckets must be positive")
    h = H.md5_32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    b = df.withColumn("__h", h).withColumn(
        "bucket", (F.col("__h") % n_buckets).cast("int")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(n_tokens_col).over(w)
    start = (cum - F.col(n_tokens_col)).cast("long")
    return (
        b.withColumn("start_off", start)
        .withColumn("pack_id", F.floor(F.col("start_off") / seq_len).cast("long"))
        .drop("__h")
    )
