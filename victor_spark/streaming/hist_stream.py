"""Streaming quantile rollup: a persistent fixed-edge histogram
maintained across micro-batches — the latency/size-percentile dashboard
loop.

Completes the streaming-sketch trio with the third state discipline:

- HLL rollup (`sketch_stream.py`): merge = element-wise MAX → naturally
  idempotent under checkpoint replay.
- Bloom screen (`bloom_stream.py`): merge = word-wise OR → idempotent.
- Histogram (here): merge = bin-count SUM, which is NOT idempotent — a
  replayed batch folded into a running total would double-count. The
  standard foreachBatch answer is an EPOCH-KEYED idempotent write: each
  micro-batch writes its own bin table under ``state_dir/epoch=<id>``
  (a deterministic overwrite of that epoch's directory), so replaying
  epoch N rewrites epoch N instead of double-summing it, and the
  estimator sums across epoch directories at read time.

Bin edges are FIXED parameters (``lo``/``hi``/``bins``), not derived
from the data: per-batch min/max would give every batch different
edges, and bins with different edges don't merge. Fixed edges are the
production shape anyway — the value domain (latency budget, size cap)
is known, and out-of-range values clamp to the edge bins, where they
remain countable.

State size:
bins rows per epoch — a few KB; a maintenance compaction can
fold finished epochs into one base table with the same sum algebra
(not needed at any realistic epoch count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from victor_spark.fs import fs_for

_STATE_SCHEMA = "bin long, cnt long"


def _bin_expr(col: str, lo: float, hi: float, bins: int):
    span = float(hi - lo)
    raw = F.floor((F.col(col) - F.lit(float(lo))) * F.lit(float(bins)) / F.lit(span))
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(raw.cast("long"), F.lit(bins - 1).cast("long")),
    )


def batch_bins(df: DataFrame, col: str, lo: float, hi: float,
               bins: int = 256) -> DataFrame:
    """(bin, cnt) of ``col`` against the FIXED [lo, hi) edge grid —
    map-side partial aggregation; out-of-range values clamp to the edge
    bins. NULL and NaN rows are EXCLUDED (review-caught: least/greatest
    skip nulls, so a NULL value used to land in the TOP bin and NaN in
    bin 0 — a latency stream where timeouts carry null latency would
    silently drag p95/p99 toward hi)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    return (
        df.where(F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double")))
        .select(_bin_expr(col, lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def stream_quantile_rollup(
    values: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    lo: float,
    hi: float,
    bins: int = 256,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``state_dir`` as the epoch-keyed histogram of every value
    of ``col`` seen on the stream. ``quantile_estimate`` reads it.

    Restart semantics: the checkpoint replays unacknowledged batches;
    the replayed epoch OVERWRITES its own ``epoch=<id>`` directory with
    identical content (binning is deterministic), so the cross-epoch sum
    never double-counts — exactly-once state without transactional
    sinks."""
    spark = values.sparkSession
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")

    # persist the edge parameters next to the state: a reader passing a
    # DIFFERENT grid would silently remap every quantile onto the wrong
    # edges (review-caught) — quantile_estimate validates against this
    import json as _json

    fs_for(spark, state_dir).write_bytes_atomic(
        state_dir.rstrip("/") + "/_edges.json",
        _json.dumps({"lo": lo, "hi": hi, "bins": bins}).encode(),
    )

    def _handle(batch: DataFrame, epoch_id: int) -> None:
        rows = batch_bins(batch, col, lo, hi, bins).collect()  # ≤ bins rows
        spark.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir.rstrip("/") + f"/epoch={int(epoch_id)}")

    writer = (
        values.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_bins(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The cross-epoch (bin, cnt) sum, or None if no state exists.
    Epochs without a ``_SUCCESS`` marker are skipped: ``mode("overwrite")``
    is delete-first, so a crash mid-epoch-write leaves a partial
    directory until the stream restarts and replays that epoch —
    reading it would throw on a truncated part-file or silently
    undercount (review-caught; same marker discipline as state.py)."""
    fs = fs_for(spark, state_dir)
    if not fs.exists(state_dir):
        return None
    epochs = [
        d for d in fs.listdir(state_dir)
        if d.startswith("epoch=")
        and fs.exists(state_dir.rstrip("/") + "/" + d + "/_SUCCESS")
    ]
    if not epochs:
        return None
    df = spark.read.schema(_STATE_SCHEMA).parquet(
        *[state_dir.rstrip("/") + "/" + d for d in epochs]
    )
    return df.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def quantile_estimate(
    spark: SparkSession,
    state_dir: str,
    ps: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> dict[float, float]:
    """Interpolated quantile estimates from the persisted state — error
    bounded by one bin width, same contract as the batch
    ``hist_quantiles`` query. Returns {} if no state exists. The grid
    parameters must MATCH the rollup that wrote the state (it persists
    them in ``_edges.json``; a mismatch raises instead of silently
    remapping counts onto wrong edges)."""
    import json as _json

    fs = fs_for(spark, state_dir)
    meta_path = state_dir.rstrip("/") + "/_edges.json"
    if fs.exists(meta_path):
        meta = _json.loads(fs.read_bytes(meta_path))
        if (meta["lo"], meta["hi"], meta["bins"]) != (lo, hi, bins):
            raise ValueError(
                f"histogram grid mismatch: state was written with "
                f"lo={meta['lo']} hi={meta['hi']} bins={meta['bins']}, "
                f"reader passed lo={lo} hi={hi} bins={bins}"
            )
    merged = merged_bins(spark, state_dir)
    if merged is None:
        return {}
    rows = sorted(
        (r["bin"], r["cnt"]) for r in merged.collect()
    )  # ≤ bins rows — a bounded artifact
    n = sum(c for _b, c in rows)
    if n == 0:
        return {}
    width = (hi - lo) / bins
    out: dict[float, float] = {}
    for p in ps:
        target = p * n
        cum = 0
        val = hi
        for b, c in rows:
            if cum + c >= target:
                frac = (target - cum) / c if c else 0.0
                val = lo + (b + frac) * width
                break
            cum += c
        out[p] = val
    return out
