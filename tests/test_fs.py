"""Filesystem shim (victor_spark/fs.py) — the reference's filesystem
trait (src/filesystem/mod.rs:22-59: native/memory/web backends), mapped
to LocalFS (os/shutil) + HadoopFS (the JVM org.apache.hadoop.fs
FileSystem).

The lifecycle tests run the ENTIRE index maintenance surface over a
``file:`` URI, which routes every maintenance call through the Hadoop
code path (Hadoop's local FS implementation serves it) — the in-sandbox
stand-in for HDFS/S3 the round-3 verdict prescribed. The shim unit
tests assert primitive-level parity between the two backends.
"""

from __future__ import annotations

import pytest

from victor_spark.fs import HadoopFS, LocalFS, fs_for, join
from victor_spark.index import VectorIndex


# -- selection rule ----------------------------------------------------------


def test_fs_selection_rule(spark):
    assert isinstance(fs_for(spark, "/tmp/plain/path"), LocalFS)
    assert isinstance(fs_for(spark, "file:/tmp/uri/path"), HadoopFS)
    assert isinstance(fs_for(spark, "file:///tmp/uri/path"), HadoopFS)


def test_join_plain_and_uri():
    assert join("/a/b", "c") == "/a/b/c"
    assert join("file:/a/b/", "c", "d.json") == "file:/a/b/c/d.json"
    assert join("s3a://bucket/k", "data") == "s3a://bucket/k/data"


# -- primitive parity --------------------------------------------------------


@pytest.fixture(params=["local", "hadoop"])
def fs_and_root(request, spark, tmp_path):
    root = str(tmp_path / "fsprim")
    if request.param == "hadoop":
        root = "file:" + root
    return fs_for(spark, root), root


def test_fs_primitives(fs_and_root):
    fs, root = fs_and_root
    f = join(root, "a.bin")
    assert not fs.exists(f)
    fs.write_bytes(f, b"hello")
    assert fs.exists(f)
    assert not fs.is_dir(f)
    assert fs.read_bytes(f) == b"hello"
    assert fs.file_size(f) == 5
    # atomic overwrite
    fs.write_bytes_atomic(f, b"world!")
    assert fs.read_bytes(f) == b"world!"
    # rename refuses to clobber; replace doesn't
    g = join(root, "b.bin")
    fs.write_bytes(g, b"x")
    with pytest.raises(Exception):
        fs.rename(f, g)
    fs.replace(f, g)
    assert fs.read_bytes(g) == b"x" * 0 + b"world!"
    assert not fs.exists(f)
    # listdir + recursive sizes
    sub = join(root, "sub")
    fs.write_bytes(join(sub, "c.bin"), b"abc")
    names = sorted(fs.listdir(root))
    assert "b.bin" in names and "sub" in names
    assert fs.is_dir(sub)
    sizes = dict(fs.file_sizes(root))
    assert sum(sizes.values()) == 6 + 3
    # recursive delete
    fs.delete(sub)
    assert not fs.exists(sub)
    fs.delete(join(root, "never-existed"))  # no-op, no raise


def test_fs_file_sizes_missing_path_parity(fs_and_root):
    fs, root = fs_and_root
    assert fs.file_sizes(join(root, "never-existed")) == []


def test_fs_parquet_row_count(fs_and_root, spark):
    fs, root = fs_and_root
    d = join(root, "pq")
    spark.range(123).coalesce(2).write.parquet(d)
    # footer-only count over the directory and over a single file
    assert fs.parquet_row_count(d) == 123
    one = next(
        join(d, n) for n in fs.listdir(d) if n.endswith(".parquet")
    )
    assert 0 < fs.parquet_row_count(one) <= 123


# -- full index lifecycle over the Hadoop code path --------------------------


@pytest.fixture
def hidx(spark, tmp_path):
    return VectorIndex(spark, "file:" + str(tmp_path / "hidx"))


def test_hadoop_lifecycle_insert_search_delete_compact_stats(hidx):
    assert isinstance(hidx.fs, HadoopFS)
    hidx.insert([
        (f"doc{i}", [float(i), 1.0, 2.0, float(i % 3)],
         ["a"] if i % 2 else ["a", "b"])
        for i in range(20)
    ])
    # tagged search resolves from the metadata listing on the Hadoop FS
    top = hidx.search([1.0, 1.0, 2.0, 0.0], k=3, tags=["b"]).collect()
    assert len(top) == 3
    st = hidx.stats()
    assert sum(s["rows"] for s in st) == 20
    assert all(s["bytes"] > 0 and s["files"] > 0 for s in st)
    assert hidx.storage_bytes() > 0
    # partition-drop delete: footer counts, no data scan
    assert hidx.delete(["b"]) == 10
    assert sum(s["rows"] for s in hidx.stats()) == 10
    # row-level delete: directory swap through the Hadoop rename path
    ids = [r["id"] for r in hidx.scan().select("id").limit(3).collect()]
    assert hidx.delete_ids(ids) == 3
    assert hidx.scan().count() == 7
    res = hidx.compact(target_rows_per_file=5)
    assert res["rows"] == 7 and res["files_after"] >= 1
    assert hidx.scan().count() == 7


def test_hadoop_lifecycle_ann_artifacts_and_projection(hidx):
    hidx.insert([
        (f"x{i}", [float(i % 5), float(i % 7), 1.0, 0.5], ["a"])
        for i in range(40)
    ])
    hidx.build_pq(m=2, n_codes=4)
    assert hidx.search_pq([1.0, 2.0, 1.0, 0.5], k=3).count() == 3
    hidx.build_ivf(n_cells=4)
    assert hidx.search_ivf([1.0, 2.0, 1.0, 0.5], k=3, nprobe=2).count() == 3
    hidx.build_ivfpq(m=2, n_codes=4, n_cells=4)
    assert hidx.search_ivfpq([1.0, 2.0, 1.0, 0.5], k=3, nprobe=2).count() == 3
    # projection rewrites the table + persists the npz through the shim
    hidx.project(k=2)
    assert hidx._load_model() is not None
    assert hidx.search([1.0, 2.0, 1.0, 0.5], k=3).count() == 3
    # membership-changing ops dropped the ANN artifacts
    with pytest.raises(ValueError, match="build_pq"):
        hidx.search_pq([1.0, 2.0], k=3)
    hidx.clear()
    assert hidx.is_empty()


def test_hadoop_fresh_handle_reads_existing_index(spark, tmp_path):
    """A second VectorIndex handle (new process in real life) sees the
    listing, the data, and the artifacts written by the first."""
    path = "file:" + str(tmp_path / "shared")
    a = VectorIndex(spark, path)
    a.insert([("a", [1.0, 0.0], ["x"]), ("b", [0.0, 1.0], ["y"])])
    b = VectorIndex(spark, path)
    assert [r["content"] for r in b.scan(["x"]).collect()] == ["a"]
    assert sum(s["rows"] for s in b.stats()) == 2


# -- concurrent-writer contract (round-3 verdict task 6) ---------------------


def test_lost_update_reconciles(hidx, monkeypatch):
    """Two interleaved insert_df calls can race the listing's
    read-modify-write: writer 2 read the listing before writer 1's
    replace landed, so writer 2's replace DROPS writer 1's new tag-set
    entry. The documented contract (index.py, tag-set listing section):
    the data partition is intact, and the next listing consult runs
    _reconcile_tag_sets, which restores the entry from the partition
    directory — queries never silently lose the tag-set for good."""
    hidx.insert([("a", [1.0, 0.0], ["x"])])
    hidx.insert([("b", [0.0, 1.0], ["y"])])
    full = hidx._read_tag_sets()
    assert len(full) == 2
    # simulate the lost update: rewrite the listing without y's entry
    from victor_spark.index import tag_set_id

    y_id = tag_set_id(["y"])
    hidx._write_tag_sets([(t, ts) for t, ts in full if t != y_id])
    assert len(hidx._read_tag_sets()) == 1
    # a tagged query for the dropped set still answers (reconciler heals)
    assert [r["content"] for r in hidx.scan(["y"]).collect()] == ["b"]
    # and the listing is repaired for subsequent readers
    assert len(hidx._read_tag_sets()) == 2


def test_reconcile_only_reads_unlisted_partition(hidx, monkeypatch):
    """The heal must NOT rescan listed partitions — only the unlisted one
    pays a pruned single-partition read for its tags."""
    hidx.insert([("a", [1.0, 0.0], ["x"])])
    hidx.insert([("b", [0.0, 1.0], ["y"])])
    from victor_spark.index import tag_set_id

    full = hidx._read_tag_sets()
    y_id = tag_set_id(["y"])
    hidx._write_tag_sets([(t, ts) for t, ts in full if t != y_id])

    from pyspark.sql.readwriter import DataFrameReader

    real_read = DataFrameReader.parquet
    seen = []

    def spy(self, *paths, **k):
        seen.extend(paths)
        return real_read(self, *paths, **k)

    # spark.read is a fresh DataFrameReader per access — patch the class
    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    hidx._matching_tag_set_ids(["y"])
    recovery_reads = [p for p in seen if "tag_set_id=" in p]
    assert len(recovery_reads) == 1 and y_id in recovery_reads[0]


def test_register_merges_concurrent_listing_entries(hidx):
    """Merge-on-write: _register_tag_sets re-reads the listing right
    before its replace and unions, so an entry another writer landed
    between this writer's initial read and its flip survives (the
    remaining race is only the read->replace gap, healed by the
    reconciler)."""
    hidx.insert([("a", [1.0, 0.0], ["x"])])
    from victor_spark.index import tag_set_id

    # simulate a concurrent writer's entry appearing after our read:
    # seed the listing with a foreign entry, then register a new set
    foreign = (tag_set_id(["zzz"]), ["zzz"])
    hidx._write_tag_sets(sorted((hidx._read_tag_sets() or []) + [foreign]))
    hidx._register_tag_sets({("y",)})
    got = dict(hidx._read_tag_sets())
    assert tag_set_id(["y"]) in got and tag_set_id(["zzz"]) in got
    assert tag_set_id(["x"]) in got


def test_merge_from_across_filesystems(spark, tmp_path):
    """The docstring's cross-FS claim: a plain-path (LocalFS) shard
    merges into a file:-URI (HadoopFS) target — the append is a Spark
    job and the listing/model plumbing rides each index's own shim."""
    shard = VectorIndex(spark, str(tmp_path / "local_shard"))
    shard.insert([(f"s{i}", [float(i), 1.0], ["t"]) for i in range(6)])
    target = VectorIndex(spark, "file:" + str(tmp_path / "huri_target"))
    assert isinstance(shard.fs, LocalFS) and isinstance(target.fs, HadoopFS)
    assert target.merge_from(shard) == 6
    assert target.scan(["t"]).count() == 6
    assert sum(s["rows"] for s in target.stats()) == 6


def test_merge_from_rejects_path_aliases(spark, tmp_path):
    """The self-merge guard must catch ALIASES of the same directory
    (trailing slash, file: URI vs plain path), not just equal strings —
    a bypassed guard silently duplicates every row."""
    import pytest as _pytest

    import os

    p = str(tmp_path / "alias")
    idx = VectorIndex(spark, p)
    idx.insert([("a", [1.0, 0.0], [])])
    link = str(tmp_path / "symlink")
    os.symlink(p, link)
    for alias in (
        p + "/",
        "file:" + p,
        "file://" + p + "/",
        "file://localhost" + p,  # localhost authority == local path
        link,                     # symlinked directory resolves to p
        "file:" + link,
    ):
        with _pytest.raises(ValueError, match="itself"):
            idx.merge_from(VectorIndex(spark, alias))
    assert idx.scan().count() == 1

    # remote-URI normalization: default port and host case are aliases
    from victor_spark.index import _canon_path

    assert _canon_path("hdfs://nn:8020/warehouse/idx/") == _canon_path(
        "hdfs://NN/warehouse//idx"
    )
    assert _canon_path("hdfs://nn:9000/x") != _canon_path("hdfs://nn/x")
    assert _canon_path("s3a://bucket/k/") == _canon_path("s3a://Bucket//k")


def test_fs_mtime_and_create_exclusive_parity(fs_and_root):
    """Round-5 primitives behave identically on both backends: mtime is
    epoch seconds for files and directories; create_exclusive succeeds
    exactly once and writes its payload."""
    import time

    fs, root = fs_and_root
    d = join(root, "sub")
    fs.mkdirs(d)
    f = join(d, "x.bin")
    fs.write_bytes(f, b"payload")
    now = time.time()
    for p in (f, d):
        mt = fs.mtime(p)
        assert isinstance(mt, float)
        assert abs(mt - now) < 300  # fresh, epoch-seconds scale
    lock = join(root, "l.lock")
    assert fs.create_exclusive(lock, b"pid=1") is True
    assert fs.create_exclusive(lock, b"pid=2") is False  # already held
    assert fs.read_bytes(lock) == b"pid=1"  # loser did not clobber
    fs.delete(lock)
    assert fs.create_exclusive(lock, b"pid=3") is True  # reusable after release


def test_hadoop_path_vacuum_age_gate_and_staged_recovery(spark, tmp_path):
    """The round-5 maintenance additions work over the Hadoop code path
    (file: URI): a fresh staging dir survives default vacuum, an aged one
    is reclaimed, and recover_staged completes an interrupted move."""
    import os

    root = str(tmp_path / "hmaint")
    idx = VectorIndex(spark, "file:" + root)
    idx.insert([("a", [1.0, 0.0], ["x"])])
    # interrupted insert: complete staging (_SUCCESS) never moved at all
    from victor_spark.index import tag_set_id as _tsid

    scratch = VectorIndex(spark, str(tmp_path / "hscratch"))
    scratch.insert([("b", [2.0, 0.0], ["y"]), ("c", [3.0, 0.0], ["y"])])
    import shutil

    staging_local = os.path.join(root, "data__insert_hcrash__staging")
    shutil.copytree(
        os.path.join(str(tmp_path / "hscratch"), "data"), staging_local,
        ignore=lambda d, names: [n for n in names if n.startswith("_")],
    )
    open(os.path.join(staging_local, "_SUCCESS"), "w").close()
    # fresh staging survives the default age-gated vacuum (Hadoop mtime)
    assert idx.vacuum() == []
    assert os.path.exists(staging_local)
    recovered = idx.recover_staged()
    assert len(recovered) == 1 and not os.path.exists(staging_local)
    assert idx.scan(["y"]).count() == 2
    # aged debris IS reclaimed through the Hadoop path
    dead = os.path.join(root, "data__old")
    os.makedirs(dead)
    aged = os.path.getmtime(dead) - 5 * 3600
    os.utime(dead, (aged, aged))
    removed = idx.vacuum()
    assert removed == ["file:" + dead] and not os.path.exists(dead)


def test_listing_lock_over_hadoop_path(spark, tmp_path):
    """The advisory lock's create-exclusive + stale-expiry cycle works
    through HadoopFS (create(overwrite=False))."""
    import os

    import pytest as _pytest

    root = str(tmp_path / "hlock")
    os.makedirs(root)
    idx = VectorIndex(spark, "file:" + root, listing_lock=True)
    assert idx.fs.create_exclusive(idx.lock_path, b"pid=other")
    with _pytest.raises(TimeoutError, match="listing lock"):
        idx._acquire_listing_lock(timeout_s=0.3, stale_s=600.0)
    lock_local = os.path.join(root, "tag_sets.lock")
    old = os.path.getmtime(lock_local) - 10_000
    os.utime(lock_local, (old, old))
    idx._acquire_listing_lock(timeout_s=2.0, stale_s=600.0)
    idx._release_listing_lock()
    assert not os.path.exists(lock_local)
    # and a locked insert works end-to-end over the URI path
    idx.insert([("z", [1.0, 1.0], ["w"])])
    assert idx.scan(["w"]).count() == 1


def test_localfs_file_rename_noclobber_is_atomic(tmp_path):
    """Round-6 self-review: file renames must refuse to clobber
    ATOMICALLY (hardlink-then-unlink — no check->rename window a
    concurrent create_exclusive could slip into); directory renames keep
    the checked form (single-writer contract)."""
    import os

    import pytest

    from victor_spark.fs import LocalFS

    fs = LocalFS()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fs.write_bytes(a, b"payload")
    fs.rename(a, b)
    assert not os.path.exists(a) and fs.read_bytes(b) == b"payload"
    # no-clobber: target exists -> FileExistsError, target untouched
    fs.write_bytes(a, b"other")
    with pytest.raises(FileExistsError):
        fs.rename(a, b)
    assert fs.read_bytes(b) == b"payload"
    # missing source still raises
    with pytest.raises(OSError):
        fs.rename(str(tmp_path / "nope"), str(tmp_path / "c"))
    # directory renames keep working (the state/staging swap path)
    d1 = tmp_path / "d1"
    d1.mkdir()
    (d1 / "x").write_text("1")
    fs.rename(str(d1), str(tmp_path / "d2"))
    assert (tmp_path / "d2" / "x").read_text() == "1"


def test_vacuum_sweeps_aged_stale_lock_victims(spark, tmp_path):
    """A lock-break claimant that crashed between its victim rename and
    delete leaves lock__stale_<uuid> debris; vacuum reclaims it under
    the same age gate (fresh victims survive)."""
    import os

    from victor_spark.index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "v"))
    idx.insert([("doc", [1.0, 0.0], [])])
    victim = idx.lock_path + "__stale_deadbeef"
    idx.fs.write_bytes(victim, b"pid=crashed")
    assert idx.vacuum() == []  # fresh: survives the default age gate
    old = os.path.getmtime(victim) - 10_000
    os.utime(victim, (old, old))
    assert idx.vacuum(min_age_seconds=3600) == [victim]
    assert not os.path.exists(victim)
