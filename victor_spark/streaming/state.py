"""Crash-safe persistence for small cross-batch streaming state.

The Bloom / HLL streaming topologies keep their bounded state (one row
of packed words; a 2^p-row register table) as a parquet directory the
batch side can also read. A plain Spark ``mode("overwrite")`` rewrite of
that directory is NOT crash-safe: overwrite deletes first, so a crash
mid-write leaves the path existing but empty or partial — after which a
naive reader sees a zero-row frame and either wedges (indexing
``collect()[0]`` raises forever) or silently serves empty state.

This module gives both topologies the same swap discipline as
``VectorIndex``'s directory maintenance, over the fs shim
(victor_spark/fs.py — so streaming state is object-store-capable too):

write:  state__tmp ← new data (complete before anything is touched)
        state → state__old   (retire)
        state__tmp → state   (promote)
        delete state__old

read:   if state is missing, read whichever surviving copy exists IN
        PLACE, preferring a COMPLETE tmp over old: tmp counts as
        complete only when it carries Spark's _SUCCESS commit marker.
        When both survive with tmp complete, the crash fell between
        retire and promote and tmp is the newer post-batch state the
        stream converges to on replay. A tmp WITHOUT the marker is a
        partial write (e.g. crash #1 between retire and promote, then
        crash #2 inside the next write_state's rewrite of tmp) and is
        never read — old, the last complete pre-batch copy, wins. The
        read never renames: a destructive "heal" could race an
        in-flight writer between its retire and promote renames and
        crash either side, and the next write_state clears the
        leftover copies anyway. A zero-row read (legacy partial write)
        is treated as no-state rather than wedging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from victor_spark.fs import fs_for, join as fsjoin


def _is_complete(fs, path: str) -> bool:
    """A directory counts as a complete parquet copy only with Spark's
    _SUCCESS commit marker (written last by the output committer)."""
    return fs.exists(path) and fs.exists(fsjoin(path, "_SUCCESS"))


def read_state(
    spark: SparkSession, state_dir: str, schema: str
) -> DataFrame | None:
    """The persisted state frame, or None if no (usable) state exists.
    Reads a surviving copy of an interrupted swap IN PLACE (no renames —
    see module docstring; tmp wins over old only when its _SUCCESS
    marker proves it complete — a double-crash can leave tmp partial);
    guards the empty-dir case so callers can index collect() results
    safely."""
    fs = fs_for(spark, state_dir)
    old, tmp = state_dir + "__old", state_dir + "__tmp"
    path = None
    if fs.exists(state_dir):
        path = state_dir
    elif _is_complete(fs, tmp):
        path = tmp
    elif fs.exists(old):
        path = old
    if path is None:
        return None
    df = spark.read.schema(schema).parquet(path)
    if df.isEmpty():  # legacy non-atomic partial write
        return None
    return df


def write_state(df: DataFrame, state_dir: str) -> None:
    """Atomically-as-possible replace ``state_dir`` with ``df``: the new
    copy is COMPLETE on disk before the live directory is touched, and a
    crash at any point leaves at least one complete copy for read_state
    to heal from. (On object stores the renames are copy+delete — the
    same documented window as the index's directory swaps.)"""
    fs = fs_for(df.sparkSession, state_dir)
    old, tmp = state_dir + "__old", state_dir + "__tmp"
    fs.delete(tmp)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    # read_state's completeness test is the _SUCCESS marker; clusters
    # with mapreduce.fileoutputcommitter.marksuccessfuljobs=false write
    # none, which would silently demote every crash recovery to the
    # stale old copy — so own the marker rather than assume the
    # committer config
    if not fs.exists(fsjoin(tmp, "_SUCCESS")):
        fs.write_bytes(fsjoin(tmp, "_SUCCESS"), b"")
    fs.delete(old)
    if fs.exists(state_dir):
        fs.rename(state_dir, old)
    fs.rename(tmp, state_dir)
    fs.delete(old)
