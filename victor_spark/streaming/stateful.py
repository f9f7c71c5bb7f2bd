"""Stateful streaming operators (extension — the reference has no
streaming at all, SURVEY.md §2.5).

Two shapes on top of ingest.py's windowed aggregation:

- exactly-once stream dedup: ``dropDuplicates`` scoped by a watermark, the
  streaming twin of operators/dedup.py::exact_duplicates. State holds one
  key per event id inside the watermark horizon — bounded, like every
  production dedup-on-ingest stage.
- session windows via ``applyInPandasWithState``: the custom stateful
  operator Structured Streaming can't express with built-ins alone.
  Sessions close after a 30-minute silence gap (same rule as the batch
  ``events_sessionize`` catalog query); open sessions ride in the state
  store keyed by user and are emitted when the event-time timeout fires.

Scale posture: state is per-key and watermark-bounded on both operators;
the state store shuffles on the grouping key exactly once (same exchange
the batch twin pays), and Arrow batches keep the Python hop vectorized.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from victor_spark.streaming.ingest import ensure_event_time
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MINUTES = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def dedup_events_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop replayed/duplicate events by event_id within the watermark
    horizon (at-least-once upstream → exactly-once downstream).

    ``dropDuplicatesWithinWatermark``, NOT plain ``dropDuplicates``:
    Spark only evicts dedup state when the subset ties keys to event
    time — with ``dropDuplicates(["event_id"])`` the watermark is
    declared but never applied to the dedup state, which then grows
    O(stream length) until the state store blows up (this is the exact
    situation the WithinWatermark variant exists for). The contract is
    correspondingly horizon-scoped: a replay arriving MORE than the
    watermark after the original is no longer remembered — the standard
    at-least-once ingest trade, state O(events per horizon)."""
    return (
        ensure_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def _sessionize_group(
    key: Tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session assembly: extend the open session with each Arrow
    batch; emit closed sessions; park the still-open one in the state store
    with an event-time timeout at (session end + gap)."""
    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    # gather this micro-batch's event times (already one user)
    times = []
    for pdf in pdf_iter:
        times.append(pdf["ts"].astype("datetime64[us]").astype("int64"))
    ts_us = pd.concat(times).sort_values().to_numpy()

    # interval merge: each event is a [t, t] interval carrying count 1;
    # the parked open session is one [start, end] interval carrying its
    # accumulated count. Sorting by interval START and sweeping handles
    # late-but-admitted events correctly in every position — an event
    # BEFORE the open session extends session_start backwards (the old
    # sweep anchored start at the parked value and mislabeled the
    # session), and one more than a gap before it forms its own earlier
    # session instead of silently merging (review-caught divergences
    # from the batch events_sessionize twin).
    items = [(int(t), int(t), 1) for t in ts_us]
    if state.exists:
        s0, e0, n0 = state.get
        items.append((int(s0), int(e0), int(n0)))
        items.sort(key=lambda it: (it[0], it[1]))

    sessions = []  # closed sessions to emit
    start_us, end_us, n = items[0]
    for s, e, c in items[1:]:
        if s - end_us > gap_us:
            sessions.append((start_us, end_us, n))
            start_us, end_us, n = s, e, c
        else:
            end_us = max(end_us, e)
            n += c
    state.update((start_us, end_us, n))
    state.setTimeoutTimestamp(end_us // 1000 + gap_us // 1000)

    if sessions:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization: per-user sessions closed by a >30-minute
    silence gap (the batch twin is the events_sessionize catalog query).

    Built on ``applyInPandasWithState``: Spark shuffles events to their
    user's state partition, hands each user's rows to Python as Arrow
    batches, and fires the event-time timeout once the watermark passes a
    session's close horizon — at which point the session is emitted and
    its state evicted."""
    return (
        ensure_event_time(events.select("user_id", "ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
