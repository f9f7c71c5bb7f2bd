"""Streaming tokenizer serving: the encode farm as a Structured
Streaming topology (the 19th).

Production tokenization is a SERVING problem: the vocabulary (BPE merge
table or unigram piece table) is a frozen build artifact trained on the
batch plane, and documents arriving continuously — the curation
stream's output landing as parquet — are encoded on the way into the
training-data lake. Encode is STATELESS (each row depends only on the
frozen table and its own text), so this is the straight-pipe streaming
shape: ``readStream`` → the SAME Arrow-batched encode operators the
batch side uses (operators/bpe.py apply_bpe, operators/unigram.py
apply_unigram) → ``writeStream`` append sink. No watermark, no state
store; stream == batch holds exactly (asserted in
tests/test_streaming.py) and the topology scales as a pure map — at
100 TB/day the knobs are source file sizing and Arrow batch size, the
same knobs as the batch farms.

``tokenize_documents`` is the shared transform: exactly one of
``merges`` (BPE, rank-priority encode) or ``unigram_logps`` (Viterbi
encode) picks the tokenizer; output appends ``tokens array<string>``
and ``n_tokens`` to the input columns, usable verbatim on batch and
streaming relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def tokenize_documents(
    docs: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    unigram_logps: dict[str, float] | None = None,
) -> DataFrame:
    """Encode a documents-shaped relation with a FROZEN tokenizer table.

    Exactly one of ``merges`` / ``unigram_logps`` must be given. Appends
    ``tokens`` (the subword array) and ``n_tokens``; every input column
    passes through. Pure narrow Arrow farm — identical semantics on
    batch and streaming inputs (the curation stream's contract)."""
    if (merges is None) == (unigram_logps is None):
        raise ValueError(
            "tokenize_documents: pass exactly one of merges (BPE) or "
            "unigram_logps (unigram-LM)"
        )
    clash = {"tokens", "n_tokens"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"tokenize_documents input columns {sorted(clash)} collide "
            "with the tokenizer output columns — rename them upstream "
            "(the curate_documents contract)"
        )
    if merges is not None:
        from victor_spark.operators.bpe import apply_bpe

        enc = apply_bpe(docs, text_col, merges, out_col="tokens")
    else:
        from victor_spark.operators.unigram import apply_unigram

        enc = apply_unigram(docs, text_col, unigram_logps, out_col="tokens")
    return enc.withColumn("n_tokens", F.size("tokens").cast("long"))


def stream_tokenized_documents(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    merges: list[tuple[str, str]] | None = None,
    unigram_logps: dict[str, float] | None = None,
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously encode documents-shaped parquet landing under
    ``src_dir`` into tokenized rows appended at ``out_dir``.

    The input schema is read once from the files already present
    (Structured Streaming's parquet source requires a declared schema;
    pinning it to the landing table's own schema is the standard move —
    a schema CHANGE upstream should fail loudly here, not be inferred
    around). The tokenizer table ships in the task closure exactly like
    the batch farms'."""
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(src_dir)
    out = tokenize_documents(
        docs, text_col=text_col, merges=merges, unigram_logps=unigram_logps
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        # trigger(availableNow=False) RAISES in pyspark; continuous mode
        # uses the default trigger (the warc_stream precedent)
        writer = writer.trigger(availableNow=True)
    return writer.start()
