"""Structured Streaming ingest: availableNow drain equals batch results."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from victor_spark.sources import load_table
from victor_spark.streaming import hourly_event_counts_stream, stream_events_to_table


def _stage_dir(tmp_path) -> str:
    """Spark's streaming file source monitors a DIRECTORY; the testdata
    table is a single parquet file, so stage it into one."""
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_stream_search_matches_batch(spark, tmp_path):
    """A drained query stream produces exactly the batch per-query top-k."""
    import json

    from victor_spark.functions.vector import to_double_array
    from victor_spark.sources import load_table
    from victor_spark.streaming.search import search_microbatch, stream_search

    corpus = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # stage the query feed as a file-source stream
    qdir = tmp_path / "queries"
    queries.coalesce(1).write.parquet(str(qdir))
    qstream = spark.readStream.schema(queries.schema).format("parquet").load(str(qdir))

    got = []
    q = stream_search(
        qstream, corpus, k=3,
        sink=lambda df, epoch: got.extend(
            (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
            for r in df.collect()
        ),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    expect = {
        (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
        for r in search_microbatch(queries, corpus, k=3).collect()
    }
    assert set(got) == expect
    assert len(got) == 4 * 3  # 4 queries × top-3


def _stream_events(spark, src):
    """readStream over the events file; ts arrives as nanos-long (see
    sources/tables.py) and is truncated to a microsecond timestamp."""
    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).format("parquet").load(src)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def test_stream_ingest_matches_batch(spark, tmp_path):
    src = _stage_dir(tmp_path)
    batch = load_table(spark, SF_SMOKE, "events")
    raw_schema = spark.read.parquet(src).schema
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream_events_to_table(spark, src, sink, ckpt, raw_schema)
    out = spark.read.parquet(sink)
    assert out.count() == batch.count()
    # partitioned by event_type on disk
    assert any(p.startswith("event_type=") for p in os.listdir(sink))


def test_windowed_stream_agg_matches_batch(spark, tmp_path):
    src = _stage_dir(tmp_path)
    agg = hourly_event_counts_stream(_stream_events(spark, src))
    sink = str(tmp_path / "agg_sink")
    ckpt = str(tmp_path / "agg_ckpt")
    (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    expected = {
        (r["hour"], r["event_type"]): r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match its batch twin, and the bulk of windows should be emitted
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) * 2 // 3


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    # stage the same file TWICE (at-least-once upstream); stream dedup must
    # emit each event_id exactly once
    from victor_spark.streaming import dedup_events_stream

    d = tmp_path / "dup_src"
    d.mkdir()
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "part-0.parquet")
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "part-1.parquet")
    deduped = dedup_events_stream(_stream_events(spark, str(d)))
    sink = str(tmp_path / "dd_sink")
    ckpt = str(tmp_path / "dd_ckpt")
    (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(sink)
    n_distinct = load_table(spark, SF_SMOKE, "events").count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    # applyInPandasWithState sessionizer vs the batch lag+cumsum rule.
    # Which sessions are emitted depends on micro-batch layout (sessions
    # closed by a later in-batch event always; each user's final session
    # only if a later batch advances the watermark past its timeout), so
    # assert the layout-independent invariants: everything emitted is a
    # true batch session, and everything closed by data is emitted.
    from pyspark.sql import Window
    from victor_spark.streaming import sessionize_stream

    src = _stage_dir(tmp_path)
    sessions = sessionize_stream(_stream_events(spark, src))
    sink = str(tmp_path / "sess_sink")
    ckpt = str(tmp_path / "sess_ckpt")
    (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }

    gap_us = 30 * 60 * 1_000_000
    from victor_spark.sources.tables import epoch_us

    e = load_table(spark, SF_SMOKE, "events").select(
        "user_id", epoch_us("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus")
    sess = (
        e.withColumn("prev", F.lag("tus").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull() | (F.col("tus") - F.col("prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.timestamp_micros(F.min("tus")).alias("session_start"),
            F.timestamp_micros(F.max("tus")).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    all_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess.collect()
    }
    last = sess.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    closed_by_data = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess.join(
            last,
            (sess.user_id == last.user_id) & (sess.sess_id == last.last_id),
            "left_anti",
        ).collect()
    }
    assert got <= all_sessions  # nothing invented, boundaries/counts exact
    assert closed_by_data <= got  # every data-closed session emitted
    assert got  # the smoke data must actually close some sessions


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """Drained event stream enriched as-of against a static per-user state
    table equals the batch as-of join."""
    from victor_spark.operators.asof import asof_join
    from victor_spark.sources import load_table
    from victor_spark.streaming.enrich import stream_asof_enrich

    src = f"{SF_SMOKE}/events.parquet"
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id") < 20).select(
        "event_id", "user_id", "ts", "value"
    )
    # static right side: this user's error history (ts + severity)
    state = load_table(spark, SF_SMOKE, "events").filter(
        (F.col("event_type") == "error") & (F.col("user_id") < 20)
    ).select("user_id", "ts", F.col("value").alias("sev"))

    evdir = tmp_path / "ev"
    ev.coalesce(1).write.parquet(str(evdir))
    stream = spark.readStream.schema(ev.schema).format("parquet").load(str(evdir))

    got = []
    q = stream_asof_enrich(
        stream, state, on=["user_id"],
        sink=lambda df, epoch: got.extend(
            (r["event_id"], r["ts_right"], r["sev_right"]) for r in df.collect()
        ),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    expect = {
        (r["event_id"], r["ts_right"], r["sev_right"])
        for r in asof_join(ev, state, on=["user_id"]).collect()
    }
    assert set(got) == expect
    assert len(got) == ev.count()


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Drained stream-stream interval join == the batch join (both sides
    watermarked; append rows finalize as the drain advances watermarks)."""
    from victor_spark.streaming.interval_join import incident_window_join_stream

    src = _stage_dir(tmp_path)
    stream = _stream_events(spark, src)
    out = incident_window_join_stream(stream, window_minutes=1440)
    sink = str(tmp_path / "ij_sink")
    ckpt = str(tmp_path / "ij_ckpt")
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["incident_id"], r["event_id"], r["lag_sec"])
        for r in spark.read.parquet(sink).collect()
    }

    e = load_table(spark, SF_SMOKE, "events")
    inc = e.filter((F.col("event_type") == "error") & (F.col("value") > 150.0)).select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("incident_user"),
        F.col("ts").alias("inc_ts"),
    )
    fu = e.select("event_id", "user_id", F.col("ts").alias("ev_ts"))
    cond = (
        (F.col("incident_user") == F.col("user_id"))
        & (F.col("ev_ts") >= F.col("inc_ts"))
        & (F.col("ev_ts") < F.col("inc_ts") + F.expr("INTERVAL 1440 MINUTES"))
        & (F.col("event_id") != F.col("incident_id"))
    )
    expect = {
        (r["incident_id"], r["event_id"], r["lag_sec"])
        for r in inc.join(fu, cond)
        .select(
            "incident_id", "event_id",
            F.timestamp_diff("SECOND", F.col("inc_ts"), F.col("ev_ts")).alias("lag_sec"),
        )
        .collect()
    }
    assert expect  # the smoke data must actually produce joined rows
    assert got == expect


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """A drained document stream screened against the static corpus finds
    exactly the pairs the batch incremental operator finds."""
    from victor_spark.operators.dedup import incremental_near_duplicates
    from victor_spark.sources import load_table
    from victor_spark.streaming.dedup_stream import stream_incremental_dedup

    corpus = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    batch = corpus.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    bdir = tmp_path / "docs"
    batch.coalesce(2).write.parquet(str(bdir))  # >=2 files -> micro-batches
    stream = spark.readStream.schema(batch.schema).format("parquet").load(str(bdir))

    got = []
    q = stream_incremental_dedup(
        stream, corpus, "doc_id", "text",
        sink=lambda df, epoch: got.extend(
            (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
            for r in df.collect()
        ),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    expect = {
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in incremental_near_duplicates(
            corpus, batch, "doc_id", "text"
        ).collect()
    }
    assert set(got) == expect
    assert len(got) == len(expect)  # no pair duplicated across micro-batches


def test_stream_distinct_rollup_matches_batch(spark, tmp_path):
    """A drained value stream maintains an HLL register table whose
    estimate equals the batch sketch over all the data — per-batch merge
    (element-wise max) loses nothing across micro-batch boundaries."""
    from victor_spark.operators.sketches import approx_distinct
    from victor_spark.sources import load_table
    from victor_spark.streaming.sketch_stream import (
        distinct_estimate,
        stream_distinct_rollup,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        F.concat(F.lit("u-"), (F.col("doc_id") % 97).cast("string")).alias("x")
    )
    sdir = tmp_path / "vals"
    docs.repartition(3).write.parquet(str(sdir))  # >=3 files
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .load(str(sdir))
    )

    state = str(tmp_path / "hll_state")
    q = stream_distinct_rollup(
        stream, "x", state_dir=state, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    streamed = distinct_estimate(spark, state, correct=True)
    batch = approx_distinct(docs, "x")
    assert streamed == batch  # bit-identical registers -> identical estimate
    assert abs(streamed - 97) < 10  # and it is a sane distinct estimate

    # a second drain over the SAME checkpoint replays nothing and the
    # idempotent merge leaves the estimate unchanged
    stream2 = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )
    q2 = stream_distinct_rollup(
        stream2, "x", state_dir=state, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert distinct_estimate(spark, state, correct=True) == streamed


def test_stream_seen_filter_emits_new_keys_at_most_once(spark, tmp_path):
    """The Bloom seen-screen: first occurrence of each key is emitted as
    new exactly once across micro-batches (no false negatives against
    the filter), repeats are flagged seen, and a re-drain over the same
    checkpoint emits nothing new."""
    from victor_spark.streaming.bloom_stream import stream_seen_filter

    # three files -> three micro-batches; keys overlap across batches
    rows = [(f"k-{i % 40}", i) for i in range(120)]
    src = spark.createDataFrame(rows, "key string, seq long")
    sdir = tmp_path / "keys"
    src.repartition(3).write.parquet(str(sdir))
    stream = (
        spark.readStream.schema(src.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )

    got = []
    q = stream_seen_filter(
        stream, "key",
        state_dir=str(tmp_path / "bloom"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=lambda df, epoch: got.extend(
            (r["key"], r["seen"], epoch) for r in df.collect()
        ),
    )
    q.awaitTermination(120)

    assert len(got) == 120
    new_keys = [k for k, seen, _ in got if not seen]
    # every distinct key surfaces as new (no false negatives against the
    # filter lose a first occurrence here: fill is tiny)
    assert set(new_keys) == {f"k-{i}" for i in range(40)}
    # a key never tests new again after the batch that admitted it:
    # all its seen=False emissions come from ONE micro-batch (duplicates
    # inside the admitting batch share the pre-batch state by contract)
    new_epochs: dict[str, set] = {}
    for k, seen, epoch in got:
        if not seen:
            new_epochs.setdefault(k, set()).add(epoch)
    assert all(len(eps) == 1 for eps in new_epochs.values())
    # and later batches flag repeats as seen
    assert any(seen for _, seen, _ in got)

    # re-drain same checkpoint: nothing replays, nothing new
    got2 = []
    stream2 = (
        spark.readStream.schema(src.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )
    q2 = stream_seen_filter(
        stream2, "key",
        state_dir=str(tmp_path / "bloom"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=lambda df, epoch: got2.extend(df.collect()),
    )
    q2.awaitTermination(120)
    assert got2 == []


def test_stream_chunked_ingest_matches_batch(spark, tmp_path):
    """A drained raw-document stream chunked+embedded through
    add_chunked per micro-batch yields exactly the batch-ingested index:
    same chunk contents, same provenance tags, same search results."""
    from victor_spark.index import VectorIndex
    from victor_spark.streaming.index_ingest import stream_chunked_ingest

    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(4)],
        "doc_id long, text string",
    )
    sdir = tmp_path / "docs"
    docs.repartition(2).write.parquet(str(sdir))
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )

    s_idx = VectorIndex(spark, str(tmp_path / "s_ix"))
    q = stream_chunked_ingest(
        stream, s_idx, "doc_id", "text",
        checkpoint_dir=str(tmp_path / "ckpt"), tags=["corpus"],
    )
    q.awaitTermination(120)

    b_idx = VectorIndex(spark, str(tmp_path / "b_ix"))
    b_idx.add_chunked(docs, "doc_id", "text", tags=["corpus"])

    s_rows = {(r.content, tuple(r.tags)) for r in s_idx.scan().collect()}
    b_rows = {(r.content, tuple(r.tags)) for r in b_idx.scan().collect()}
    assert s_rows == b_rows
    assert len(s_rows) == 12  # 4 docs x 3 chunks
    # chunk-scoped search agrees across both indexes
    s_hit = s_idx.search_text("d2w12 d2w13", k=1, tags=["doc:2"]).collect()[0]
    b_hit = b_idx.search_text("d2w12 d2w13", k=1, tags=["doc:2"]).collect()[0]
    assert s_hit.content == b_hit.content
    assert s_hit.score == b_hit.score


def test_stream_index_ingest_builds_searchable_index(spark, tmp_path):
    """A drained (content, embedding, tags) stream appended through
    VectorIndex.insert_df yields the same searchable index as a batch
    insert: row count, tag listing, and top-1 results all match."""
    from victor_spark.index import VectorIndex
    from victor_spark.streaming.index_ingest import stream_index_ingest

    rows = [
        ("alpha", [1.0, 0.0, 0.0], ["x"]),
        ("beta", [0.0, 1.0, 0.0], ["x", "y"]),
        ("gamma", [0.0, 0.0, 1.0], ["z"]),
        ("delta", [0.5, 0.5, 0.0], ["x"]),
    ]
    src = spark.createDataFrame(
        rows, "content string, embedding array<double>, tags array<string>"
    )
    sdir = tmp_path / "stream_src"
    src.coalesce(2).write.parquet(str(sdir))  # >=2 files -> micro-batches
    stream = spark.readStream.schema(src.schema).format("parquet").load(str(sdir))

    idx = VectorIndex(spark, str(tmp_path / "sidx"))
    q = stream_index_ingest(stream, idx, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert idx.scan().count() == 4
    assert sorted(ts for _, ts in idx._read_tag_sets()) == [["x"], ["x", "y"], ["z"]]
    assert idx.search([1.0, 0.0, 0.0], k=1).first()["content"] == "alpha"
    assert idx.search([0.0, 0.0, 1.0], k=1, tags=["z"]).first()["content"] == "gamma"
    # late micro-batch after restart: new files picked up by a fresh run
    more = spark.createDataFrame(
        [("epsilon", [0.9, 0.1, 0.0], ["w"])], src.schema
    )
    more.coalesce(1).write.mode("append").parquet(str(sdir))
    q2 = stream_index_ingest(stream, idx, checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert idx.scan().count() == 5
    assert idx.search([0.9, 0.1, 0.0], k=1).first()["content"] == "epsilon"


def test_stream_frame_extraction_matches_batch(spark, tmp_path):
    """The drained frame table equals batch sample_frames — and the
    topology is streaming-NATIVE (mapInPandas on the unbounded frame, no
    foreachBatch)."""
    from victor_spark.operators.multimodal import sample_frames, synthesize_media
    from victor_spark.streaming.frames import stream_frame_extraction

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") % 3 == 2
    )
    media = synthesize_media(docs, "doc_id", "text", kind="video")
    mdir = tmp_path / "media_src"
    media.coalesce(1).write.parquet(str(mdir))
    mstream = (
        spark.readStream.schema(media.schema).format("parquet").load(str(mdir))
    )
    out = tmp_path / "frames"
    q = stream_frame_extraction(
        mstream, str(out), str(tmp_path / "ckpt"), frame_bytes=16, stride=2
    )
    q.awaitTermination(120)

    got = {
        (r["media_id"], r["frame_idx"], r["n_frames"], bytes(r["frame"]))
        for r in spark.read.parquet(str(out)).collect()
    }
    expect = {
        (r["media_id"], r["frame_idx"], r["n_frames"], bytes(r["frame"]))
        for r in sample_frames(media, frame_bytes=16, stride=2).collect()
    }
    assert got == expect and len(got) > 0


def test_stream_state_survives_interrupted_swap(spark, tmp_path):
    """Crash-safety of the persisted streaming state (streaming/state.py):
    a crash mid-swap leaves either the old or the new complete copy, and
    read_state serves it IN PLACE (no renames — a destructive heal could
    race an in-flight writer); the next write_state clears the leftover
    copies; a legacy zero-row state directory reads as no-state."""
    import os
    import shutil

    from victor_spark.streaming.state import read_state, write_state

    schema = "words array<bigint>"
    sdir = str(tmp_path / "state")
    df1 = spark.createDataFrame([([1, 2, 3],)], schema)
    write_state(df1, sdir)
    assert read_state(spark, sdir, schema).collect()[0]["words"] == [1, 2, 3]

    # overwrite with new state — normal path
    df2 = spark.createDataFrame([([9, 9],)], schema)
    write_state(df2, sdir)
    assert read_state(spark, sdir, schema).collect()[0]["words"] == [9, 9]

    # simulate a crash between retire and promote: live dir gone, the
    # pre-batch copy parked at __old — served in place, NOT renamed
    os.rename(sdir, sdir + "__old")
    healed = read_state(spark, sdir, schema)
    assert healed is not None and healed.collect()[0]["words"] == [9, 9]
    assert os.path.isdir(sdir + "__old") and not os.path.exists(sdir)

    # the next write_state recovers the live dir and clears leftovers
    # (read_state fed the prev state into the writer in real topologies)
    write_state(df2, sdir)
    assert os.path.isdir(sdir) and not os.path.exists(sdir + "__old")

    # crash shape where only the NEW complete copy (tmp) survives
    os.rename(sdir, sdir + "__tmp")
    healed = read_state(spark, sdir, schema)
    assert healed is not None and healed.collect()[0]["words"] == [9, 9]
    os.rename(sdir + "__tmp", sdir)  # restore for the next phase

    # crash BETWEEN retire and promote: BOTH __old (pre-batch) and __tmp
    # (new — guaranteed complete, it is fully written before any rename)
    # survive. The NEWER tmp copy must win, so out-of-band readers see
    # the state the stream converges to on replay (round-4 advice).
    shutil.rmtree(sdir)
    write_state(df1, str(tmp_path / "pre"))
    os.rename(str(tmp_path / "pre"), sdir + "__old")
    write_state(df2, str(tmp_path / "post"))
    os.rename(str(tmp_path / "post"), sdir + "__tmp")
    healed = read_state(spark, sdir, schema)
    assert healed is not None and healed.collect()[0]["words"] == [9, 9]

    # DOUBLE crash (round-5 advice): crash #1 left old+tmp, the next
    # write_state deleted and began REWRITING tmp, crash #2 left tmp
    # PARTIAL (no _SUCCESS marker). The partial tmp must NOT win — old,
    # the last complete copy, is served.
    os.remove(os.path.join(sdir + "__tmp", "_SUCCESS"))
    healed = read_state(spark, sdir, schema)
    assert healed is not None and healed.collect()[0]["words"] == [1, 2, 3]
    # ... and when a partial tmp is the ONLY survivor, that's no-state
    shutil.rmtree(sdir + "__old")
    assert read_state(spark, sdir, schema) is None
    shutil.rmtree(sdir + "__tmp")

    # legacy partial write: state dir exists but holds no rows
    spark.createDataFrame([], schema).write.parquet(sdir)
    assert read_state(spark, sdir, schema) is None


def test_stream_seen_filter_tolerates_words_column_and_empty_state(
    spark, tmp_path
):
    """A batch column named 'words' must survive the probe crossJoin
    un-clobbered (the filter payload rides a reserved alias), and an
    empty/partial state directory must not wedge the query."""
    from victor_spark.streaming.bloom_stream import stream_seen_filter

    # pre-create a ZERO-ROW state dir — the legacy partial-write shape
    sdir = str(tmp_path / "bloom")
    spark.createDataFrame([], "words array<bigint>").write.parquet(sdir)

    rows = [(f"k-{i % 5}", f"w{i}") for i in range(20)]
    src = spark.createDataFrame(rows, "key string, words string")
    srcdir = tmp_path / "keys"
    src.repartition(2).write.parquet(str(srcdir))
    stream = (
        spark.readStream.schema(src.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(srcdir))
    )
    got = []
    q = stream_seen_filter(
        stream, "key",
        state_dir=sdir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=lambda df, epoch: got.extend(df.collect()),
    )
    q.awaitTermination(120)
    assert len(got) == 20
    # the user's words column came through intact
    assert {r["words"] for r in got} == {f"w{i}" for i in range(20)}
    assert {r["key"] for r in got if not r["seen"]} == {f"k-{i}" for i in range(5)}


def test_stream_quantile_rollup_matches_batch(spark, tmp_path):
    """The third streaming-sketch state discipline: bin-count SUM is not
    idempotent, so state is EPOCH-KEYED (each micro-batch overwrites its
    own epoch=<id> directory) and the estimator sums across epochs —
    replay rewrites an epoch instead of double-counting it. The streamed
    estimate must equal the batch estimate over the same data exactly
    (deterministic binning, integer sums)."""
    from victor_spark.streaming.hist_stream import (
        batch_bins,
        merged_bins,
        quantile_estimate,
        stream_quantile_rollup,
    )

    rows = [(float(i % 997),) for i in range(5000)]
    src = spark.createDataFrame(rows, "v double")
    sdir = tmp_path / "vals"
    src.repartition(3).write.parquet(str(sdir))
    stream = (
        spark.readStream.schema(src.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )
    state = str(tmp_path / "hist")
    q = stream_quantile_rollup(
        stream, "v", state_dir=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
        lo=0.0, hi=1000.0, bins=256,
    )
    q.awaitTermination(120)

    # multi-epoch state accumulated
    import os

    epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
    assert len(epochs) == 3

    est = quantile_estimate(spark, state, [0.5, 0.9, 0.99], 0.0, 1000.0)
    # exact parity with the batch path over the same data
    batch = batch_bins(src, "v", 0.0, 1000.0).collect()
    streamed = merged_bins(spark, state).collect()
    assert sorted((r["bin"], r["cnt"]) for r in streamed) == sorted(
        (r["bin"], r["cnt"]) for r in batch
    )
    # estimates track the true quantiles within one bin width (~3.9)
    assert abs(est[0.5] - 498.0) < 8.0
    assert abs(est[0.9] - 897.0) < 8.0

    # replaying an epoch is idempotent: re-drain over the same checkpoint
    # adds no epochs and changes no counts
    stream2 = (
        spark.readStream.schema(src.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )
    q2 = stream_quantile_rollup(
        stream2, "v", state_dir=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
        lo=0.0, hi=1000.0, bins=256,
    )
    q2.awaitTermination(120)
    again = merged_bins(spark, state).collect()
    assert sorted((r["bin"], r["cnt"]) for r in again) == sorted(
        (r["bin"], r["cnt"]) for r in batch
    )


def test_stream_quantile_rollup_clamps_out_of_range(spark, tmp_path):
    from victor_spark.streaming.hist_stream import batch_bins

    df = spark.createDataFrame(
        [(-50.0,), (0.0,), (999.0,), (5000.0,)], "v double"
    )
    got = {r["bin"]: r["cnt"] for r in batch_bins(df, "v", 0.0, 1000.0, bins=10).collect()}
    assert got[0] == 2  # -50 clamps down, 0.0 lands in bin 0
    assert got[9] == 2  # 999 in last bin, 5000 clamps up


def test_stream_state_works_over_file_uri(spark, tmp_path):
    """streaming/state.py routes through the fs shim, so persistent
    sketch state is object-store-capable — exercised via a file: URI
    (the Hadoop code path), including the crash-survivor read."""
    from victor_spark.fs import HadoopFS, fs_for
    from victor_spark.streaming.state import read_state, write_state

    schema = "words array<bigint>"
    sdir = "file:" + str(tmp_path / "hstate")
    assert isinstance(fs_for(spark, sdir), HadoopFS)
    write_state(spark.createDataFrame([([7, 8],)], schema), sdir)
    assert read_state(spark, sdir, schema).collect()[0]["words"] == [7, 8]
    write_state(spark.createDataFrame([([9],)], schema), sdir)
    assert read_state(spark, sdir, schema).collect()[0]["words"] == [9]
    # crash survivor served in place through the Hadoop path too
    fs = fs_for(spark, sdir)
    fs.rename(sdir, sdir + "__old")
    assert read_state(spark, sdir, schema).collect()[0]["words"] == [9]


def test_stream_media_decode_matches_batch(spark, tmp_path):
    """Topology 15 — streaming media decode: readStream over a MIXED
    media table (uncompressed PPM in batch 1, compressed PNG in batch 2;
    two micro-batches), the SAME real-codec decode operators as the
    batch side, append sink. Stateless map => stream == batch exactly,
    for both the image-stats and perceptual-hash transforms — including
    the full inflate+unfilter pipeline inside the stream."""
    from victor_spark.operators import multimodal as M
    from victor_spark.streaming.media_stream import stream_decode_media

    docs = spark.createDataFrame(
        [(i, f"doc text number {i} with some extra words") for i in range(20)],
        "id long, text string",
    )
    hashed = docs.selectExpr("id", "md5(text) AS text")
    media = M.synthesize_ppm(
        hashed.filter("id < 10"), "id", "text", 8, 8
    ).unionByName(
        M.synthesize_png(hashed.filter("id >= 10"), "id", "text", 8, 8)
    )
    src = str(tmp_path / "media_src")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    media.filter("media_id < 10").coalesce(1).write.parquet(src)
    media.filter("media_id >= 10").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(media.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    for transform, batch_fn in (
        ("image_stats", M.decode_image_stats),
        ("image_dhash", M.image_dhash),
    ):
        sink = str(tmp_path / f"sink_{transform}")
        ckpt = str(tmp_path / f"ckpt_{transform}")
        stream_decode_media(stream, sink, ckpt, transform=transform
                            ).awaitTermination()
        got = {tuple(r) for r in spark.read.parquet(sink).collect()}
        want = {tuple(r) for r in batch_fn(media).collect()}
        assert got == want and len(got) == 20

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown transform"):
        stream_decode_media(stream, str(tmp_path / "x"), str(tmp_path / "y"),
                            transform="nope")


def test_stream_media_dedup_on_ingest_composition(spark, tmp_path):
    """Pure composition of existing topologies — image dedup ON INGEST:
    readStream → image_dhash (real decode + perceptual hash) feeds
    stream_seen_filter as its key column, so a batch-2 image that is a
    REAL RESIZE of a batch-1 image probes the Bloom state as seen while
    genuinely new images pass. No new operator code; this is the 100 TB
    media-crawl dedup loop assembled from the shipped pieces."""
    from victor_spark.operators import multimodal as M
    from victor_spark.streaming.bloom_stream import stream_seen_filter

    docs1 = spark.createDataFrame(
        [(i, f"first wave doc {i}") for i in range(8)], "id long, text string"
    )
    docs2 = spark.createDataFrame(
        [(i, f"second wave doc {i}") for i in range(100, 104)],
        "id long, text string",
    )
    base = M.synthesize_ppm(
        docs1.selectExpr("id", "md5(text) AS text"), "id", "text", 8, 8
    )
    # wave 2 = 4 genuinely new images + REAL 2x upscales of images 0-3
    fresh = M.synthesize_ppm(
        docs2.selectExpr("id", "md5(text) AS text"), "id", "text", 8, 8
    )
    dups = M.resize_images(
        base.filter("media_id < 4").withColumn(
            "media_id", base["media_id"] + 1000
        ),
        16, 16,
    )
    src = str(tmp_path / "crawl")
    base.coalesce(1).write.parquet(src)
    fresh.unionByName(dups).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    got: dict[int, bool] = {}

    def sink(df, epoch_id):
        for r in df.collect():
            got[r["media_id"]] = r["seen"]

    stream_seen_filter(
        M.image_dhash(stream), "dhash",
        state_dir=str(tmp_path / "bloom_state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=sink,
    ).awaitTermination()

    assert len(got) == 16
    assert all(not got[i] for i in range(8))          # wave 1: all new
    assert all(not got[i] for i in range(100, 104))   # wave 2 fresh: new
    assert all(got[i] for i in range(1000, 1004))     # resized copies: seen


def test_write_state_owns_success_marker(spark, tmp_path):
    """Clusters with marksuccessfuljobs=false write no _SUCCESS, which
    would silently demote every tmp-side crash recovery to the stale
    old copy — write_state therefore creates the marker itself when the
    committer didn't."""
    import os

    from victor_spark.streaming.state import read_state, write_state

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prev = hconf.get(key)
    hconf.set(key, "false")
    try:
        schema = "words array<bigint>"
        sdir = str(tmp_path / "nostate")
        write_state(spark.createDataFrame([([1],)], schema), sdir)
        write_state(spark.createDataFrame([([2],)], schema), sdir)
        # crash between retire and promote: tmp must still be
        # recoverable, which requires the marker we now own
        write_state(spark.createDataFrame([([3],)], schema),
                    str(tmp_path / "next"))
        os.rename(sdir, sdir + "__old")
        os.rename(str(tmp_path / "next"), sdir + "__tmp")
        assert os.path.exists(os.path.join(sdir + "__tmp", "_SUCCESS"))
        healed = read_state(spark, sdir, schema)
        assert healed is not None and healed.collect()[0]["words"] == [3]
    finally:
        if prev is None:
            hconf.unset(key)
        else:
            hconf.set(key, prev)


def test_stream_warc_first_mile_matches_batch(spark, tmp_path):
    """Topology 16 — streaming first mile: crawl shards arrive
    continuously, readStream(binaryFile) + the SAME record-walk and
    HTML-extraction transforms as the batch path, append sink. Two
    shard files -> two micro-batches under maxFilesPerTrigger=1;
    stateless map => stream == batch exactly, for both the WARC
    (response/HTML) and WET (conversion/plain-text) payload contracts."""
    from pyspark.sql import functions as F

    from victor_spark.functions.html import escape_html
    from victor_spark.sources.warc import (
        warc_documents,
        wet_documents,
        write_warc,
    )
    from victor_spark.streaming.warc_stream import stream_warc_documents

    rows = spark.createDataFrame(
        [(f"http://c.test/{i}", f"document number {i} with words") for i in range(12)],
        "uri string, txt string",
    )
    html = rows.select(
        "uri",
        F.concat(F.lit("<html><head><title>t</title></head><body><h1>h</h1><p>"),
                 escape_html(F.col("txt")),
                 F.lit("</p></body></html>")).alias("html"),
    )
    src_warc = str(tmp_path / "src_warc")
    src_wet = str(tmp_path / "src_wet")
    # two writes with distinct prefixes -> two files -> two micro-batches
    write_warc(html.filter("uri < 'http://c.test/5'").repartition(1),
               src_warc, "uri", "html", prefix="a").collect()
    write_warc(html.filter("uri >= 'http://c.test/5'").repartition(1),
               src_warc, "uri", "html", prefix="b").collect()
    write_warc(rows.filter("uri < 'http://c.test/5'").repartition(1),
               src_wet, "uri", "txt", prefix="a",
               record_type="conversion").collect()
    write_warc(rows.filter("uri >= 'http://c.test/5'").repartition(1),
               src_wet, "uri", "txt", prefix="b",
               record_type="conversion").collect()

    for kind, src, batch_df in (
        ("warc", src_warc, warc_documents(spark, src_warc)),
        ("wet", src_wet, wet_documents(spark, src_wet)),
    ):
        sink = str(tmp_path / f"sink_{kind}")
        ckpt = str(tmp_path / f"ckpt_{kind}")
        q = stream_warc_documents(
            spark, src, sink, ckpt, kind=kind, max_files_per_trigger=1
        )
        q.awaitTermination()
        got = {tuple(r) for r in spark.read.parquet(sink).collect()}
        want = {tuple(r) for r in batch_df.collect()}
        assert got == want and len(got) == 12, kind

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown kind"):
        stream_warc_documents(spark, src_warc, str(tmp_path / "x"),
                              str(tmp_path / "y"), kind="nope")


def test_stream_dedup_state_is_watermark_evictable(spark, tmp_path):
    """Review-caught: dropDuplicates(['event_id']) after a watermark
    declares eviction but never applies it — state grows O(stream). The
    plan must carry the WithinWatermark dedup operator, whose state
    evicts past the horizon."""
    from victor_spark.streaming import dedup_events_stream

    d = tmp_path / "src"
    d.mkdir()
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "p.parquet")
    deduped = dedup_events_stream(_stream_events(spark, str(d)))
    plan = deduped._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan, plan[:500]


def test_stream_sinks_support_continuous_mode(spark, tmp_path):
    """Review-caught: trigger(availableNow=False) RAISES in pyspark, so
    topologies passing the flag straight through could never run in
    their documented continuous mode. available_now=False must START
    (default trigger) — stopped immediately here."""
    from victor_spark.sources.warc import write_warc
    from victor_spark.streaming import stream_decode_media, stream_warc_documents

    rows = spark.createDataFrame([("http://x.test/1", "<p>a</p>")],
                                 "uri string, html string")
    src = str(tmp_path / "wsrc")
    write_warc(rows.repartition(1), src, "uri", "html").collect()
    q = stream_warc_documents(
        spark, src, str(tmp_path / "wout"), str(tmp_path / "wck"),
        available_now=False,
    )
    try:
        assert q.isActive
    finally:
        q.stop()

    from victor_spark.operators import multimodal as M

    docs = spark.createDataFrame([(1, "x")], "id long, text string")
    media = M.synthesize_ppm(docs.selectExpr("id", "md5(text) AS text"),
                             "id", "text", 4, 4)
    msrc = str(tmp_path / "msrc")
    media.coalesce(1).write.parquet(msrc)
    stream = spark.readStream.schema(media.schema).format("parquet").load(msrc)
    q2 = stream_decode_media(stream, str(tmp_path / "mout"),
                             str(tmp_path / "mck"), available_now=False)
    try:
        assert q2.isActive
    finally:
        q2.stop()


def test_hist_bins_exclude_null_and_nan(spark):
    """Review-caught: least/greatest skip nulls, so NULL values landed in
    the TOP bin (dragging p95/p99 toward hi) and NaN in bin 0. Both are
    excluded now."""
    from victor_spark.streaming.hist_stream import batch_bins

    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan",),)], "v double"
    )
    got = {r["bin"]: r["cnt"] for r in batch_bins(df, "v", 0.0, 10.0, 10).collect()}
    assert got == {1: 1}  # only the real value, in its own bin


def test_hist_state_skips_partial_epochs_and_validates_grid(spark, tmp_path):
    """Review-caught pair: a crash mid-epoch-write leaves a partial dir
    (no _SUCCESS) that must be skipped, and a reader passing a different
    lo/hi/bins grid must get a loud error, not silently-remapped
    quantiles."""
    from victor_spark.streaming.hist_stream import quantile_estimate

    src = tmp_path / "vals"
    src.mkdir()
    vals = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    vals.coalesce(1).write.parquet(str(src / "f1"))
    state = str(tmp_path / "hstate")
    from victor_spark.streaming import stream_quantile_rollup

    stream_quantile_rollup(
        spark.readStream.schema("v double").parquet(str(src / "f1")),
        "v", state, str(tmp_path / "hck"), lo=0.0, hi=100.0, bins=10,
    ).awaitTermination()
    # plant a PARTIAL epoch: directory with garbage, no _SUCCESS
    bad = tmp_path / "hstate" / "epoch=999"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not parquet at all")
    import pytest as _pytest

    q = quantile_estimate(spark, state, [0.5], lo=0.0, hi=100.0, bins=10)
    assert 40.0 <= q[0.5] <= 60.0  # partial epoch skipped, not crashed
    with _pytest.raises(ValueError, match="grid mismatch"):
        quantile_estimate(spark, state, [0.5], lo=0.0, hi=10.0, bins=10)


def test_sessionize_group_extends_start_backwards_and_splits():
    """Review-caught: a late-but-admitted event BEFORE the parked open
    session must extend session_start backwards, and one more than a gap
    earlier must form its own session — the old sweep anchored start at
    the parked value."""
    import pandas as pd

    from victor_spark.streaming.stateful import _sessionize_group

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = False
            self.updated = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v

        def setTimeoutTimestamp(self, _ms):
            pass

        def remove(self):
            self._v = None

    H = 3_600_000_000  # 1h in us
    t10 = 10 * H

    # case 1: admitted event 4 min before the open session's start
    st = FakeState((t10, t10, 3))
    pdf = pd.DataFrame({"ts": [pd.Timestamp(t10 - 4 * 60_000_000, unit="us")]})
    out = list(_sessionize_group((7,), iter([pdf]), st))
    assert out == []  # nothing closes
    start, end, n = st.updated
    assert start == t10 - 4 * 60_000_000 and end == t10 and n == 4

    # case 2: admitted event 40 min before start (> 30-min gap): its own
    # earlier session closes and emits; the parked session stays open
    st = FakeState((t10, t10, 3))
    pdf = pd.DataFrame({"ts": [pd.Timestamp(t10 - 40 * 60_000_000, unit="us")]})
    out = list(_sessionize_group((7,), iter([pdf]), st))
    assert len(out) == 1 and out[0]["n_events"].tolist() == [1]
    assert st.updated == (t10, t10, 3)


def test_bloom_seen_filter_null_keys_and_reserved_columns(spark, tmp_path):
    """Review-caught pair: NULL keys are flagged seen=True (conservative
    — they'd otherwise read neither-new-nor-seen and re-surface every
    batch), and a batch already carrying a 'seen' column is rejected
    instead of producing an ambiguous duplicate."""
    from victor_spark.streaming import stream_seen_filter

    src = tmp_path / "bsrc"
    src.mkdir()
    spark.createDataFrame([("a",), (None,), ("b",)], "url string") \
        .coalesce(1).write.parquet(str(src / "f1"))
    stream = spark.readStream.schema("url string").parquet(str(src / "f1"))
    got = {}

    def sink(df, epoch_id):
        for r in df.collect():
            got[r["url"]] = r["seen"]

    stream_seen_filter(
        stream, "url", str(tmp_path / "bstate"), str(tmp_path / "bck"),
        sink,
    ).awaitTermination()
    assert got["a"] is False and got["b"] is False
    assert got[None] is True  # null key: never emitted as new

    bad = spark.readStream.schema("url string, seen boolean").parquet(
        str(src / "f1")
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="seen"):
        stream_seen_filter(
            bad, "url", str(tmp_path / "bstate2"), str(tmp_path / "bck2"),
            sink,
        ).awaitTermination()


def test_curation_stream_equals_batch_and_gates_quality(spark, tmp_path):
    """Topology 18 (curation stream): shards -> extract -> C4 line
    filter -> quality gate, streaming, must equal the same transforms
    on the batch plane — and the stages must be non-vacuous: the junk
    lines are dropped from every doc and the shouty doc fails the
    quality bar entirely."""
    from victor_spark.functions.html import escape_html
    from victor_spark.sources.warc import warc_documents, write_warc
    from victor_spark.streaming import curate_documents, stream_curated_documents

    rows = spark.createDataFrame(
        [
            (
                f"http://c.test/{i}",
                (
                    "!!! ??? *** $$$ ###."  # shouty doc: fails quality
                    if i == 0
                    else f"This is sentence number {i} with the needed words."
                )
                + "\nBuy now\nno terminal punctuation here at all",
            )
            for i in range(12)
        ],
        "uri string, txt string",
    )
    paras = F.array_join(
        F.transform(
            F.split(escape_html(F.col("txt")), "\n"),
            lambda x: F.concat(F.lit("<p>"), x, F.lit("</p>")),
        ),
        "\n",
    )
    html = rows.select(
        "uri",
        F.concat(
            F.lit("<html><head><title>t</title></head><body>"),
            paras,
            F.lit("</body></html>"),
        ).alias("html"),
    )
    src = str(tmp_path / "src")
    # two prefixes -> two files -> two micro-batches
    write_warc(html.filter("uri < 'http://c.test/5'").repartition(1),
               src, "uri", "html", prefix="a").collect()
    write_warc(html.filter("uri >= 'http://c.test/5'").repartition(1),
               src, "uri", "html", prefix="b").collect()

    sink = str(tmp_path / "sink")
    q = stream_curated_documents(
        spark, src, sink, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(sink).collect()}
    want = {
        tuple(r)
        for r in curate_documents(warc_documents(spark, src)).collect()
    }
    assert got == want
    # non-vacuous: 11 of 12 docs survive (the shouty one fails quality),
    # and C4 kept exactly the one sentence line of each survivor's three
    assert len(got) == 11
    by_url = {r for r in spark.read.parquet(sink).select(
        "n_lines", "n_kept").collect()}
    assert by_url == {(3, 1)}


def test_curate_documents_rejects_colliding_columns(spark):
    import pytest

    from victor_spark.streaming import curate_documents

    docs = spark.createDataFrame(
        [("a.", 0.9)], "text string, quality double"
    )
    with pytest.raises(ValueError, match="quality"):
        curate_documents(docs)


def test_tokenize_stream_equals_batch_both_tokenizers(spark, tmp_path):
    """Topology 19 (tokenizer serving): documents landing as parquet are
    encoded with a FROZEN tokenizer table — the production shape, where
    the vocab is a batch-plane build artifact and the stream only
    applies it. stream == batch must hold exactly for BOTH tokenizer
    families (BPE rank-priority encode, unigram Viterbi encode), and
    the encode must be non-vacuous (multi-char subwords fire)."""
    from victor_spark.operators.bpe import train_bpe_merges
    from victor_spark.operators.unigram import train_unigram
    from victor_spark.streaming import (
        stream_tokenized_documents,
        tokenize_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"low lower lowest newer new wider doc{i}") for i in range(12)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "landing")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    docs.filter("doc_id < 6").repartition(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 6").repartition(1).write.mode("append").parquet(src)

    merges = [
        (r["left"], r["right"])
        for r in train_bpe_merges(docs, "text", num_merges=8)
        .orderBy("rank").collect()
    ]
    logps = {
        r["piece"]: r["logp"]
        for r in train_unigram(
            docs, "text", vocab_size=60, seed_size=200, em_iters=2
        ).collect()
    }

    for name, kw in (("bpe", {"merges": merges}),
                     ("uni", {"unigram_logps": logps})):
        sink = str(tmp_path / f"sink_{name}")
        q = stream_tokenized_documents(
            spark, src, sink, str(tmp_path / f"ckpt_{name}"),
            max_files_per_trigger=1, **kw,
        )
        q.awaitTermination()
        got = {
            (r["doc_id"], tuple(r["tokens"]), r["n_tokens"])
            for r in spark.read.parquet(sink).collect()
        }
        want = {
            (r["doc_id"], tuple(r["tokens"]), r["n_tokens"])
            for r in tokenize_documents(
                spark.read.parquet(src), **kw
            ).collect()
        }
        assert got == want, name
        assert len(got) == 12, name
        # non-vacuous: some multi-char subword fired
        assert any(
            len(t) > 1 for _d, toks, _n in got for t in toks
        ), name


def test_tokenize_documents_validates_inputs(spark):
    import pytest

    from victor_spark.streaming import tokenize_documents

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        tokenize_documents(d)
    with pytest.raises(ValueError, match="exactly one"):
        tokenize_documents(d, merges=[("a", "b")], unigram_logps={"a": -1.0})
    clash = spark.createDataFrame(
        [(1, "x", 5)], "doc_id long, text string, n_tokens long"
    )
    with pytest.raises(ValueError, match="collide"):
        tokenize_documents(clash, merges=[("a", "b")])


def test_vocab_drift_stream_equals_batch(spark, tmp_path):
    """Topology 20 (vocab-drift monitor): documents landing as parquet
    are scored against a FROZEN reference vocabulary. The epoch-keyed
    state must reproduce the batch plane exactly: summed token/OOV
    totals equal the whole-corpus drift_metrics, and the cumulative
    novel-type inventory equals the batch OOV type set."""
    from victor_spark.streaming import (
        cumulative_drift,
        drift_metrics,
        epoch_drift,
        stream_vocab_drift,
        type_drift,
    )

    vocab = ["the", "data", "join", "sort"]
    docs = spark.createDataFrame(
        [
            (0, "the data join novel0 the"),
            (1, "sort sort data novel1"),
            (2, "the novel0 novel2"),
            (3, "join data the sort"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "landing")
    # two files -> two micro-batches under maxFilesPerTrigger
    docs.filter("doc_id < 2").repartition(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 2").repartition(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = stream_vocab_drift(stream, vocab, state, str(tmp_path / "ckpt"))
    q.awaitTermination()

    cum = cumulative_drift(spark, state).collect()[0]
    batch = drift_metrics(type_drift(spark.read.parquet(src), vocab)).collect()[0]
    assert cum["n_tokens"] == batch["n_tokens"] == 16
    assert cum["oov_tokens"] == batch["oov_tokens"] == 4
    assert cum["novel_types"] == batch["oov_types"] == 3
    assert cum["oov_token_rate"] == batch["oov_token_rate"]

    per = epoch_drift(spark, state).collect()
    assert len(per) == 2
    # additive metrics split exactly across epochs
    assert sum(r["n_tokens"] for r in per) == 16
    assert sum(r["oov_tokens"] for r in per) == 4
    # novel types count FIRST epochs only: novel0 belongs to the epoch
    # that saw doc 0, never double-counted when doc 2 repeats it
    assert sum(r["novel_types"] for r in per) == 3
    assert all(r["oov_token_rate"] is not None for r in per)


def test_vocab_drift_restart_is_idempotent(spark, tmp_path):
    """Restart discipline: re-running the stream over the same landing
    dir with the same checkpoint must not change the state (no new
    epochs, no double counts); a NEW file then lands as exactly one new
    epoch whose novel_types excludes types already inventoried."""
    from victor_spark.streaming import (
        cumulative_drift,
        epoch_drift,
        stream_vocab_drift,
    )

    vocab = ["known"]
    src = str(tmp_path / "landing")
    spark.createDataFrame(
        [(0, "known fresh0 fresh0")], "doc_id long, text string"
    ).repartition(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    def run():
        s = spark.readStream.schema(schema).parquet(src)
        stream_vocab_drift(s, vocab, state, ckpt).awaitTermination()

    run()
    first = cumulative_drift(spark, state).collect()[0]
    run()  # no new files: must be a no-op
    again = cumulative_drift(spark, state).collect()[0]
    assert first == again

    # one new file: one new epoch; the repeated type fresh0 is NOT novel
    spark.createDataFrame(
        [(1, "known fresh0 fresh1")], "doc_id long, text string"
    ).repartition(1).write.mode("append").parquet(src)
    run()
    per = epoch_drift(spark, state).collect()
    assert len(per) == 2
    assert [r["novel_types"] for r in per] == [1, 1]
    cum = cumulative_drift(spark, state).collect()[0]
    assert cum["n_tokens"] == 6 and cum["oov_tokens"] == 4
    assert cum["novel_types"] == 2


def test_type_drift_validates_and_handles_empty(spark, tmp_path):
    from victor_spark.streaming import (
        cumulative_drift,
        drift_metrics,
        epoch_drift,
        type_drift,
    )

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty reference vocabulary"):
        type_drift(d, [])
    # empty corpus: metrics are zeros with a NULL rate, never a throw
    empty = d.filter("doc_id < 0")
    m = drift_metrics(type_drift(empty, ["x"])).collect()[0]
    assert (
        m["n_tokens"], m["n_types"], m["oov_tokens"], m["oov_types"],
        m["oov_token_rate"],
    ) == (0, 0, 0, 0, None)
    # no state on disk -> None, not an exception
    assert epoch_drift(spark, str(tmp_path / "nope")) is None
    assert cumulative_drift(spark, str(tmp_path / "nope")) is None


def test_screen_stream_equals_batch_and_flags_planted_rows(spark, tmp_path):
    """Topology 21 (streaming contamination screen): conversation-shaped
    rows landing as parquet are screened against a FROZEN eval-prompt
    shingle set BEFORE reaching the training lake — the gate form of the
    batch plane's sft_contamination_screen (which reports; this flags
    and keeps every row). stream == batch must hold exactly across
    micro-batches, the planted contaminated rows (and ONLY those) must
    flag, and an empty bench must flag nothing while dropping no rows."""
    from victor_spark.streaming import (
        screen_conversations,
        stream_screened_conversations,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [(i, f"clean{i} body text w{i}a w{i}b w{i}c w{i}d") for i in range(10)]
    rows += [(100, f"prefix {shared} suffix"), (101, f"also has {shared} inside")]
    docs = spark.createDataFrame(rows, "conv_id long, text string")
    src = str(tmp_path / "landing")
    docs.filter("conv_id < 5").repartition(1).write.mode("append").parquet(src)
    docs.filter("conv_id >= 5").repartition(1).write.mode("append").parquet(src)

    bench = spark.createDataFrame([(shared,)], "text string")
    sink = str(tmp_path / "sink")
    q = stream_screened_conversations(
        spark, src, sink, str(tmp_path / "ckpt"), bench,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["n_shingles"], r["n_shared"], r["contaminated"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["conv_id"], r["n_shingles"], r["n_shared"], r["contaminated"])
        for r in screen_conversations(
            spark.read.parquet(src), bench, "text"
        ).collect()
    }
    assert got == want
    assert len(got) == 12  # the gate KEEPS every row
    flagged = {c for c, _ns, _sh, f in got if f}
    assert flagged == {100, 101}
    # empty bench: nothing flags, nothing drops
    empty = spark.createDataFrame([], "text string")
    eb = screen_conversations(docs, empty, "text").collect()
    assert len(eb) == 12
    assert all(not r["contaminated"] and r["n_shared"] == 0 for r in eb)


def test_screen_conversations_validates_column_collisions(spark):
    import pytest

    from victor_spark.streaming import screen_conversations

    d = spark.createDataFrame(
        [(1, "x", True)], "conv_id long, text string, contaminated boolean"
    )
    b = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="collide"):
        screen_conversations(d, b, "text")
