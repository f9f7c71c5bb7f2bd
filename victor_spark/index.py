"""VectorIndex — the reference's entire public API, Spark-native.

Reference surface (/root/reference/src/db.rs, src/lib.rs): insert
(content, embedding, tags) records; top-k nearest neighbors by cosine
similarity filtered by tag-superset; clear; always-on 8-bit quantized
storage; PCA projected mode under storage pressure.

Physical design (SURVEY.md §1.4):
- one parquet table partitioned by `tag_set_id` = sha256 of the canonical
  sorted tag list (reference filename_for_tags, db.rs:645-650). Partition
  pruning over tag_set_id IS the reference's file selection; the tag-set ↔
  id map lives in a tiny `tag_sets.parquet` metadata listing (the analog of
  index.bin, db.rs:629-643) maintained on insert/delete, so resolving the
  tag-superset predicate never touches the data.
- vectors stored quantized (qmin/qmax/quant columns, packed_vector.rs
  semantics) exactly as the reference always stores packed; search
  dequantizes in the scan projection (a codegen'd transform, free relative
  to I/O).
- PCA mode: a saved PCAModel artifact next to the table flips inserts to
  project before write and search to euclidean-ascending scoring
  (db.rs:233-255 — with the farthest-k bug fixed, SURVEY.md §2.3).

Scale posture: inserts are append-only blind writes (no read-modify-write —
the reference rewrites content.bin wholesale per batch, db.rs:558-588; we
don't). Search is scan → prune → score → TakeOrderedAndProject: no shuffle,
k rows to the driver. A hot tag-set is just a big partition — AQE and
maxPartitionBytes split it across executors.
"""

from __future__ import annotations

import hashlib
import io
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from victor_spark.fs import fs_for
from victor_spark.fs import join as fsjoin

from victor_spark.functions.vector import (
    cosine,
    cosine_to_literal,
    dequantize,
    euclidean,
    euclidean_to_literal,
    lit_doubles_2d,
    quantize,
)
from victor_spark.operators.pca import PCAModel, fit_pca, project_column
from victor_spark.operators.topk import topk

INSERT_SCHEMA = StructType(
    [
        StructField("content", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("tags", ArrayType(StringType()), True),
    ]
)


def _canon_path(p: str) -> str:
    """Normalize a path for identity comparison (merge_from's self-merge
    guard), so aliases of the same directory compare equal:

    - a ``file:`` scheme with an empty or ``localhost`` authority IS the
      local path (``file://localhost/p`` == ``file:///p`` == ``/p``);
    - local paths are resolved through ``os.path.realpath`` so symlinked
      directories and relative spellings cannot bypass the guard;
    - remote URIs lowercase scheme+host, drop the scheme's default port
      (``hdfs://nn:8020`` == ``hdfs://nn``), collapse duplicate slashes
      and the trailing slash."""
    import os as _os
    from urllib.parse import urlparse

    def _collapse(path: str) -> str:
        while "//" in path:
            path = path.replace("//", "/")
        return path.rstrip("/") or "/"

    u = urlparse(p)
    scheme = u.scheme.lower()
    if scheme in ("", "file"):
        host = u.netloc.lower()
        if scheme == "file" and host not in ("", "localhost"):
            # genuinely remote file:// authority — no local resolution
            return f"file://{host}{_collapse(u.path)}"
        path = u.path if scheme == "file" else p
        return _os.path.realpath(_collapse(path))
    host = u.netloc.lower()
    default_port = {"hdfs": ":8020", "webhdfs": ":9870", "ftp": ":21"}.get(scheme)
    if default_port and host.endswith(default_port):
        host = host[: -len(default_port)]
    return f"{scheme}://{host}{_collapse(u.path)}"


def tag_set_id(tags: list[str]) -> str:
    """Canonical partition key for a tag set: sha256 of the sorted,
    deduplicated, comma-joined tags (reference: sha256 of the Debug format
    of the sorted BTreeSet, db.rs:645-650 — same canonicalization, cleaner
    encoding)."""
    canon = ",".join(sorted(set(tags)))
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


class DimensionMismatchError(ValueError):
    """Insert batch contains vectors of a different dimension than the
    index (reference panics on record-size mismatch, db.rs:516-539)."""


class VectorIndex:
    def __init__(
        self, spark: SparkSession, path: str, listing_lock: bool = False
    ):
        self.spark = spark
        self.path = path
        # Optional ADVISORY write lock for the tag-set listing: when True,
        # every listing read-modify-write (_register_tag_sets) runs under
        # a create-exclusive lock file with stale expiry, closing the
        # lost-update window for callers who cannot serialize their
        # insert_df calls. Off by default — the documented single-writer
        # contract plus reconciler heal is the blessed mode, and
        # merge_from is the blessed multi-writer ingest pattern. The lock
        # is ADVISORY: all writers must opt in, and on S3-like object
        # stores create-exclusive is best-effort rather than atomic.
        self.listing_lock = listing_lock
        # maintenance backend (victor_spark/fs.py — the reference's
        # filesystem trait, src/filesystem/mod.rs:22-59): a plain path
        # gets the os/shutil fast path; any URI scheme (hdfs://, s3a://,
        # file:) routes EVERY maintenance call — listing swaps, directory
        # renames, artifact files, footer row counts — through the JVM
        # Hadoop FileSystem, the same impls Spark's own reads use
        self.fs = fs_for(spark, path)
        self.data_path = fsjoin(path, "data")
        self.tagsets_path = fsjoin(path, "tag_sets.parquet")
        self.lock_path = fsjoin(path, "tag_sets.lock")
        self.model_path = fsjoin(path, "pca_model.npz")
        self.pq_path = fsjoin(path, "pq_codes")
        self.pq_meta_path = fsjoin(path, "pq_meta.json")
        self.ivf_path = fsjoin(path, "ivf_data")
        self.ivf_meta_path = fsjoin(path, "ivf_meta.json")
        self.ivfpq_path = fsjoin(path, "ivfpq_codes")
        self.ivfpq_meta_path = fsjoin(path, "ivfpq_meta.json")

    # -- DML ---------------------------------------------------------------

    def insert(self, rows: list[tuple[str, list[float], list[str]]]) -> None:
        """Batch insert of (content, embedding, tags) triples.

        Reference add_embeddings (db.rs:142-164): uuid per row, route to the
        tag-set file, quantize via serde, append. Here: one DataFrame append
        partitioned by tag_set_id; `uuid()` is a codegen'd expression.
        """
        df = self.spark.createDataFrame(
            [(c, [float(x) for x in v], sorted(set(t))) for c, v, t in rows],
            schema=INSERT_SCHEMA,
        )
        self.insert_df(df)

    def add(self, texts: list[str], tags: list[str] | None = None,
            dim: int = 64) -> None:
        """Embed documents with the batch embedder and insert (reference
        `add`, db.rs:102-114: fastembed over docs → add_embeddings). The
        embedding runs as an Arrow-batched pandas_udf inside the insert
        job — one distributed pass, no driver materialization."""
        from victor_spark.functions.embedder import embed

        df = self.spark.createDataFrame(
            [(t,) for t in texts], "content string"
        ).select(
            "content",
            embed("content", dim).alias("embedding"),
            F.array(*[F.lit(t) for t in sorted(set(tags or []))]).alias("tags"),
        )
        self.insert_df(df)

    def add_chunked(self, docs: DataFrame, id_col: str, text_col: str,
                    chunk_size: int = 16, overlap: int = 4,
                    tags: list[str] | None = None, dim: int = 64) -> None:
        """RAG ingestion: chunk documents into overlapping token windows,
        embed each chunk with the corpus embedder, and insert — one
        distributed dataflow (chunk = map-side explode, embed = Arrow
        pandas_udf inside the insert job, no driver materialization).

        Each chunk's content is the window text; its tags are the
        caller's tags plus ``doc:<id>``, so every chunk of a document is
        retrievable (and deletable via ``delete(tags=['doc:<id>'])``) as
        a group — the provenance link chunked serving needs."""
        from victor_spark.functions.embedder import embed
        from victor_spark.operators.chunking import chunk_tokens

        base = sorted(set(tags or []))
        ch = chunk_tokens(docs, id_col, text_col,
                          chunk_size=chunk_size, overlap=overlap)
        df = ch.select(
            F.array_join("chunk_tokens", " ").alias("content"),
            F.array_sort(
                F.array(
                    *[F.lit(t) for t in base],
                    F.concat(F.lit("doc:"), F.col(id_col).cast("string")),
                )
            ).alias("tags"),
        ).select("content", embed("content", dim).alias("embedding"), "tags")
        self.insert_df(df)

    def search_text(self, text: str, k: int = 10,
                    tags: list[str] | None = None) -> DataFrame:
        """Text-entry search (reference `search`, db.rs:198-213): embed the
        query string driver-side with the same model, then vector search."""
        from victor_spark.functions.embedder import embed_query

        dim = self.dimension()
        model = self._load_model()
        query_dim = dim if model is None else model.components.shape[0]
        return self.search(embed_query(text, query_dim or 64), k=k, tags=tags)

    def search_rerank(self, text: str, k: int = 5, fetch_k: int = 20,
                      tags: list[str] | None = None) -> DataFrame:
        """Two-stage text search: retrieve ``fetch_k`` candidates by
        embedding similarity, rerank ONLY those by lexical token-set
        Jaccard between the stored content and the query text, return
        the top ``k`` — (id, content, tags, score, rerank_score, rank).

        The retrieve+rerank serving shape: stage 1 is the index's
        bounded-heap vector search (pruned scan, TakeOrderedAndProject),
        so stage 2's cost is O(fetch_k) regardless of corpus size —
        the contract a real cross-encoder reranker slots into (swap the
        Jaccard expression for a pandas_udf scoring model; the candidate
        bound is what keeps model inference off the corpus scan path).
        Works in projected (euclidean) mode too — the lexical evidence
        is independent of the retrieval metric."""
        from pyspark.sql import Window

        from victor_spark.functions.text import tokens as _tokens

        cand = self.search_text(text, k=fetch_k, tags=tags)
        qt = F.array_distinct(_tokens(F.lit(text.lower())))
        ct = F.array_distinct(_tokens(F.lower(F.col("content"))))
        denom = F.size(F.array_union(ct, qt))
        jac = F.when(denom == 0, F.lit(0.0)).otherwise(
            F.size(F.array_intersect(ct, qt)) / denom
        )
        w = Window.orderBy(F.desc("rerank_score"), F.asc("id"))
        return (
            cand.withColumn("rerank_score", jac)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "content", "tags", "score", "rerank_score", "rank")
        )

    def hybrid_search(self, text: str, k: int = 5, fetch_k: int = 20,
                      tags: list[str] | None = None,
                      rrf_k: int = 60) -> DataFrame:
        """Hybrid retrieval on the index: Reciprocal Rank Fusion of the
        vector leg (embedding search, top ``fetch_k``) and a lexical leg
        (token-set Jaccard of stored content vs the query text, top
        ``fetch_k``, same tag scope). Returns the fused top ``k`` —
        (id, content, tags, vec_rank, lex_rank, rrf, rank).

        RRF (Cormack et al. 2009) needs no score calibration — only
        RANKS enter (score = Σ 1/(rrf_k + rank)) — which is what makes
        it safe to fuse a cosine (or, in projected mode, euclidean)
        ranking with a Jaccard ranking. Both legs are bounded heaps;
        the fusion joins two fetch_k-row lists, so post-scan work is
        O(fetch_k) at any corpus size."""
        from pyspark.sql import Window

        from victor_spark.functions.text import tokens as _tokens

        ascending = self._load_model() is not None  # euclidean in projected mode
        vec = self.search_text(text, k=fetch_k, tags=tags)
        vw = Window.orderBy(
            F.asc("score") if ascending else F.desc("score"), F.asc("id")
        )
        vtop = vec.withColumn("vec_rank", F.row_number().over(vw)).select(
            "id", "content", "tags", "vec_rank"
        )

        qt = F.array_distinct(_tokens(F.lit(text.lower())))
        ct = F.array_distinct(_tokens(F.lower(F.col("content"))))
        denom = F.size(F.array_union(ct, qt))
        jac = F.when(denom == 0, F.lit(0.0)).otherwise(
            F.size(F.array_intersect(ct, qt)) / denom
        )
        lw = Window.orderBy(F.desc("_j"), F.asc("id"))
        ltop = (
            self.scan(tags)
            .select("id", "content", "tags", jac.alias("_j"))
            .orderBy(F.desc("_j"), F.asc("id"))
            .limit(fetch_k)
            .withColumn("lex_rank", F.row_number().over(lw))
            .select("id", "content", "tags", "lex_rank")
        )

        fused = vtop.alias("v").join(
            ltop.alias("l"), F.col("v.id") == F.col("l.id"), "full_outer"
        ).select(
            F.coalesce(F.col("v.id"), F.col("l.id")).alias("id"),
            F.coalesce(F.col("v.content"), F.col("l.content")).alias("content"),
            F.coalesce(F.col("v.tags"), F.col("l.tags")).alias("tags"),
            F.col("v.vec_rank").alias("vec_rank"),
            F.col("l.lex_rank").alias("lex_rank"),
            (
                F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("v.vec_rank")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("l.lex_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
        fw = Window.orderBy(F.desc("rrf"), F.asc("id"))
        return (
            fused.withColumn("rank", F.row_number().over(fw))
            .filter(F.col("rank") <= k)
            .select("id", "content", "tags", "vec_rank", "lex_rank", "rrf", "rank")
        )

    def insert_df(self, df: DataFrame) -> None:
        """Insert from a DataFrame with (content, embedding, tags) columns."""
        model = self._load_model()
        # In projected mode incoming vectors carry the ORIGINAL dimension
        # (the model's input side) and are projected before write
        # (db.rs:480-499); otherwise they must match the stored dimension.
        dim = model.components.shape[0] if model is not None else self.dimension()
        tags_norm = F.array_sort(F.array_distinct(F.coalesce(F.col("tags"), F.array())))
        # one validation pass over the batch yields BOTH the dimension check
        # and the batch's distinct tag-sets (the rows for the tag-set
        # metadata listing) — distinct (dim, tag-set) combos are few by
        # construction, so the collect is bounded
        combos = (
            df.select(F.size("embedding").alias("d"), tags_norm.alias("tags"))
            .distinct()
            .collect()
        )
        batch_dims = sorted({r["d"] for r in combos})
        if len(batch_dims) > 1 or (dim is not None and batch_dims and batch_dims[0] != dim):
            raise DimensionMismatchError(
                f"index dimension {dim}, batch dimensions {batch_dims}"
            )
        batch_sets = {tuple(r["tags"]) for r in combos}
        staged = df.select(
            F.col("content"),
            F.col("embedding").cast("array<double>").alias("_vec"),
            tags_norm.alias("_tags"),
        )
        if model is not None:
            # projected-insert path (db.rs:480-499); the projection gets its
            # own select so the large-model pandas_udf path is a standalone
            # projection stage (a UDF can't appear inside quantize's
            # transform() lambdas)
            staged = staged.select(
                "content",
                project_column("_vec", model).cast("array<double>").alias("_vec"),
                "_tags",
            )

        out = staged.select(
            F.expr("uuid()").alias("id"),
            F.col("content"),
            F.col("_tags").alias("tags"),
            quantize("_vec").alias("q"),
        ).select(
            "id",
            "content",
            "tags",
            F.col("q.qmin").alias("qmin"),
            F.col("q.qmax").alias("qmax"),
            # bins shifted to signed [-128,127] so parquet stores a true
            # 1-byte column — the reference's exact u8/dim + 2×f32 layout
            # (packed_vector.rs:3-9); scan() shifts back before dequantize
            F.transform(F.col("q.quant"), lambda b: (b - 128).cast("tinyint")).alias("quant"),
            F.sha2(F.array_join(F.col("tags"), ","), 256).alias("tag_set_id"),
        )
        self._staged_append(out)
        # data first, then metadata: the listing must never name a tag-set
        # whose partition directory doesn't exist yet
        self._register_tag_sets(batch_sets)

    def _staged_append(self, out: DataFrame) -> None:
        """Append partitioned rows via a PRIVATE staging directory plus
        per-file moves into the live partition dirs.

        A direct ``write.mode("append").parquet(data_path)`` is NOT safe
        under concurrent writers: Hadoop's FileOutputCommitter stages
        every concurrent job under the SAME ``<data_path>/_temporary/0``,
        and the first job to commit deletes the others' in-flight task
        files (observed as FileNotFoundException mid-commit). Each insert
        therefore writes to its own ``…__staging`` directory — its own
        private ``_temporary`` — and then moves the finished part files,
        whose names are globally unique, into the live partition
        directories. File moves never collide, so concurrent insert_df /
        merge_from calls are safe on the DATA side; the listing side
        remains merge-on-write + reconciler (contract above).

        FAILURE CONTRACT: the staging directory is deleted only after
        EVERY part file has moved. If the move loop fails partway (crash,
        transient FS error), ``__staging`` is left in place with exactly
        the not-yet-moved files — so the insert is completable, not just
        reclaimable: :meth:`recover_staged` finishes the remaining moves
        exactly-once (file names are globally unique, and a rename that
        already happened leaves no source file behind). Blindly retrying
        the insert instead would duplicate the rows whose files already
        moved; run recover_staged() — or, to abandon the partial batch,
        :meth:`vacuum` the aged staging dir (accepting the partial
        batch's already-moved rows, which the listing reconciler makes
        queryable)."""
        import uuid as _uuid

        staging = f"{self.data_path}__insert_{_uuid.uuid4().hex[:12]}__staging"
        out.write.mode("overwrite").partitionBy("tag_set_id").parquet(staging)
        self._complete_staged_moves(staging)

    def _complete_staged_moves(self, staging: str) -> None:
        """Move every staged part file into its live partition directory,
        then delete the staging dir. Idempotent/resumable: a destination
        that already exists means an earlier attempt moved this file
        (rename is atomic locally and on HDFS; on object stores the
        copy half completed) — drop the source instead of re-moving. On
        failure the staging dir is left in place (see _staged_append's
        failure contract)."""
        for d in self.fs.listdir(staging):
            if not d.startswith("tag_set_id="):
                continue
            live = fsjoin(self.data_path, d)
            self.fs.mkdirs(live)
            src_dir = fsjoin(staging, d)
            for fname in self.fs.listdir(src_dir):
                if fname.endswith(".parquet"):
                    src, dst = fsjoin(src_dir, fname), fsjoin(live, fname)
                    if self.fs.exists(dst):
                        self.fs.delete(src)
                    else:
                        self.fs.rename(src, dst)
        self.fs.delete(staging)

    def recover_staged(self) -> list[str]:
        """Complete any insert/merge interrupted during its move phase.

        A ``__staging`` directory containing Spark's ``_SUCCESS`` marker
        holds a COMPLETELY written batch whose per-file moves did not all
        finish — resume them (exactly-once, see _complete_staged_moves)
        and reconcile the tag listing so the recovered partitions are
        queryable. A staging dir WITHOUT ``_SUCCESS`` is an interrupted
        WRITE (no file of it ever went live) and is left for
        :meth:`vacuum`. Returns the staging paths completed."""
        recovered: list[str] = []
        if not self.fs.exists(self.path):
            return recovered
        for name in self.fs.listdir(self.path):
            if not name.endswith("__staging"):
                continue
            staging = fsjoin(self.path, name)
            if self.fs.exists(fsjoin(staging, "_SUCCESS")):
                self._complete_staged_moves(staging)
                recovered.append(staging)
        if recovered:
            listing = self._read_tag_sets()
            if listing is not None:
                self._reconcile_tag_sets(listing)
        return recovered

    # -- tag-set metadata listing ------------------------------------------
    #
    # The Spark analog of the reference's index.bin (db.rs:629-643): a tiny
    # (tag_set_id, tags) table kept NEXT TO the data, maintained on
    # insert/delete, and read instead of the data on every tagged scan.
    # Without it, resolving the tag-superset predicate means a full-corpus
    # distinct over the tags column before every query — a scan-the-world
    # prologue at 100 TB. The listing is O(#distinct tag-sets) — hundreds of
    # rows — so it's read and filtered driver-side with no Spark job at all,
    # exactly like the reference reads index.bin. Reads and writes go
    # through self.fs, so the listing lives wherever the data lives
    # (local disk, HDFS, object store).
    #
    # CONCURRENT-WRITER CONTRACT: the listing is maintained by
    # read-modify-write + replace, which assumes a SINGLE WRITER per
    # index (the reference has the same contract — one process owns
    # index.bin). Two concurrent insert_df calls can interleave so the
    # second replace drops the first's new tag-set entry. That lost
    # update is NOT data loss: the data partition exists, and the next
    # read that consults the listing runs _reconcile_tag_sets, which
    # diffs the listing against the partition directories and restores
    # any unlisted entry (tests/test_fs.py::test_lost_update_reconciles).
    # Queries between the lost update and the next reconcile can miss
    # the affected tag-set — callers needing multi-writer ingest should
    # serialize insert_df calls (the inserts themselves are append-only
    # parquet writes and commute; only the listing flip needs the lock).

    def _read_tag_sets(self) -> list[tuple[str, list[str]]] | None:
        """The (tag_set_id, tags) listing, or None if no metadata exists
        (an index written before this listing existed)."""
        if not self.fs.exists(self.tagsets_path):
            return None
        import pyarrow as pa
        import pyarrow.parquet as papq

        t = papq.read_table(pa.BufferReader(self.fs.read_bytes(self.tagsets_path)))
        return list(zip(
            (str(x) for x in t.column("tag_set_id").to_pylist()),
            ([list(v) for v in t.column("tags").to_pylist()]),
        ))

    def _write_tag_sets(self, rows: list[tuple[str, list[str]]]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as papq

        t = pa.table({
            "tag_set_id": pa.array([r[0] for r in rows], pa.string()),
            "tags": pa.array([r[1] for r in rows], pa.list_(pa.string())),
        })
        sink = pa.BufferOutputStream()
        papq.write_table(t, sink)
        self.fs.write_bytes_atomic(self.tagsets_path, sink.getvalue().to_pybytes())

    def _acquire_listing_lock(
        self, timeout_s: float = 60.0, stale_s: float = 600.0
    ) -> None:
        """Take the advisory listing lock: create-exclusive a lock file,
        spinning (with backoff) until it succeeds or ``timeout_s``
        elapses. A lock file older than ``stale_s`` is presumed to be a
        crashed holder's debris and is broken — NOT by check-then-delete
        (two waiters observing the same stale mtime could both delete,
        the loser's pending delete destroying the winner's freshly
        created lock and admitting two holders) but by an atomic rename
        to a waiter-unique victim name: exactly one claimant's rename
        succeeds, and the claimant RE-VERIFIES staleness on the victim
        copy (now private, so the check is race-free) before destroying
        it — a freshly re-created lock stolen by mistake is renamed
        straight back. Raises TimeoutError when a live holder outlasts
        the wait."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        payload = f"pid={os.getpid()}".encode()
        while True:
            if self.fs.create_exclusive(self.lock_path, payload):
                return
            # the deadline is enforced on EVERY path through the loop
            # (a persistently-failing mtime probe must still time out,
            # not hot-spin forever)
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"listing lock held past {timeout_s}s: {self.lock_path}"
                )
            try:
                if _time.time() - self.fs.mtime(self.lock_path) > stale_s:
                    self._break_stale_lock(stale_s)
            except Exception:
                # holder released / another waiter won the break between
                # our create-excl and mtime (LocalFS raises OSError,
                # HadoopFS a py4j wrapper) — retry after the backoff
                pass
            _time.sleep(0.05)

    def _break_stale_lock(self, stale_s: float) -> None:
        """Atomically claim a presumed-stale lock file and destroy it only
        if it really is stale. rename is atomic and refuses to clobber on
        both backends, so at most one concurrent claimant gets the file;
        the mtime re-check then runs on a path only this claimant knows.
        If the claim caught a lock that was re-created fresh in the
        window after the caller's staleness check, it is renamed back
        untouched. Should even THAT restore collide with a brand-new
        lock — a triple interleave inside microseconds of a 10-minute
        expiry — the restore is RETRIED with backoff (the colliding
        holder's critical section is sub-second, so the lock path frees
        quickly) before giving up and deleting the victim, which would
        strand the stolen holder lock-less; the retry loop shrinks that
        two-holder window from "always on collision" to "collision
        persisting past every retry", and the listing's reconciler
        heals any lost update beyond it, as it does for unlocked
        writers (round-6 advisor).
        A claimant that CRASHES between its rename and the
        delete/restore leaves ``__stale_<uuid>`` debris (swept by
        vacuum's age gate) and, if the claim had caught a fresh lock,
        strands that holder lock-less — the same reconciler contract
        bounds the damage to a healable lost update."""
        import time as _time
        import uuid as _uuid

        victim = f"{self.lock_path}__stale_{_uuid.uuid4().hex}"
        self.fs.rename(self.lock_path, victim)  # raises if we lost the race
        try:
            fresh = _time.time() - self.fs.mtime(victim) <= stale_s
        except Exception:
            fresh = False
        if fresh:
            for attempt in range(4):
                try:
                    self.fs.rename(victim, self.lock_path)
                    return
                except Exception:
                    _time.sleep(0.05 * (attempt + 1))
        self.fs.delete(victim)

    def _release_listing_lock(self) -> None:
        self.fs.delete(self.lock_path)

    def _register_tag_sets(self, batch_sets: set[tuple[str, ...]]) -> None:
        if self.listing_lock:
            self._acquire_listing_lock()
            try:
                self._register_tag_sets_unlocked(batch_sets)
            finally:
                self._release_listing_lock()
            return
        self._register_tag_sets_unlocked(batch_sets)

    def _register_tag_sets_unlocked(
        self, batch_sets: set[tuple[str, ...]]
    ) -> None:
        existing = self._read_tag_sets() or self._derive_tag_sets()
        known = {tsid for tsid, _ in existing}
        new = [
            (tag_set_id(list(ts)), list(ts))
            for ts in sorted(batch_sets)
            if tag_set_id(list(ts)) not in known
        ]
        if not new and self.fs.exists(self.tagsets_path):
            return
        # merge-on-write: the data write above can take minutes, so
        # re-read the listing immediately before the replace and union —
        # a concurrent writer that landed in the meantime keeps its
        # entry. This SHRINKS the lost-update window to the read→replace
        # gap; the contract is still single-writer (see section note),
        # with _reconcile_tag_sets healing whatever slips through.
        latest = {
            (tsid, tuple(ts)) for tsid, ts in (self._read_tag_sets() or [])
        }
        merged = latest | {(tsid, tuple(ts)) for tsid, ts in existing + new}
        self._write_tag_sets(
            sorted((tsid, list(ts)) for tsid, ts in merged)
        )

    def _derive_tag_sets(self) -> list[tuple[str, list[str]]]:
        """Rebuild the listing from the DATA LAYOUT (self-heal for indexes
        created before the metadata file existed): one directory listing,
        then ONE pruned single-row read per partition to recover its tags
        — O(partitions) tiny jobs, never a full-corpus distinct. (The
        round-3 posture nit: the old distinct+collect was paid at most
        once, but at 100 TB "once" is still a scan-the-world job; the
        partition directory names already carry the tag_set_ids, and each
        partition's tags are constant by construction, so a limit-1 read
        per directory is the whole recovery.)"""
        if self.is_empty():
            return []
        out = []
        for d in sorted(self.fs.listdir(self.data_path)):
            if not d.startswith("tag_set_id="):
                continue
            tsid = d[len("tag_set_id="):]
            row = (
                self.spark.read.parquet(fsjoin(self.data_path, d))
                .select("tags")
                .first()
            )
            if row is not None:
                out.append((tsid, list(row["tags"])))
        return out

    def _matching_tag_set_ids(self, tags: list[str]) -> list[str]:
        """tag_set_ids whose stored tag-set ⊇ ``tags`` (reference
        get_matching_db_files, db.rs:687-706), resolved from the metadata
        listing — no data scan on the common path."""
        listing = self._read_tag_sets()
        if listing is None:
            listing = self._derive_tag_sets()
            self._write_tag_sets(sorted(listing))  # heal for next time
        else:
            listing = self._reconcile_tag_sets(listing)
        want = set(tags)
        return [tsid for tsid, ts in listing if want.issubset(ts)]

    def _reconcile_tag_sets(
        self, listing: list[tuple[str, list[str]]]
    ) -> list[tuple[str, list[str]]]:
        """Repair a listing that lags the data directories — a crash between
        the data write and _register_tag_sets leaves a partition the listing
        never names, and the no-metadata heal can't fire because the file
        exists. The check is one directory listing (already the cost model
        of delete()); only UNLISTED partitions pay a pruned one-partition
        read to recover their tags. The same pass heals the lost-update
        window of the single-writer contract above."""
        if self.is_empty():
            return listing
        on_disk = {
            d[len("tag_set_id="):]
            for d in self.fs.listdir(self.data_path)
            if d.startswith("tag_set_id=")
        }
        missing = on_disk - {tsid for tsid, _ in listing}
        if not missing:
            return listing
        recovered = []
        for tsid in sorted(missing):
            row = (
                self.spark.read.parquet(
                    fsjoin(self.data_path, f"tag_set_id={tsid}")
                )
                .select("tags")
                .first()
            )
            if row is not None:
                recovered.append((tsid, list(row["tags"])))
        listing = sorted(listing + recovered)
        self._write_tag_sets(listing)
        return listing

    def clear(self) -> None:
        """Drop everything (reference clear_db, db.rs:608-625)."""
        for p in (self.data_path, self.tagsets_path, self.model_path, self.pq_path,
                  self.pq_meta_path, self.ivf_path, self.ivf_meta_path,
                  self.ivfpq_path, self.ivfpq_meta_path):
            self.fs.delete(p)

    def delete(self, tags: list[str]) -> int:
        """Delete every row whose tag-set ⊇ ``tags`` (the same superset
        semantics as search/scan). Returns the number of rows deleted.

        An extension — the reference's only deletion is clear_db — but it
        falls out of the physical layout for free: tag-supersets are whole
        ``tag_set_id=…`` partition directories, so deletion is a metadata
        listing plus directory removals. No data files are read or
        rewritten — the same reason DELETE-by-partition-key is O(partitions)
        on any hive-layout table at 100 TB.
        """
        if not tags:
            raise ValueError("delete() needs at least one tag; use clear() "
                             "to drop the whole index")
        if self.is_empty():
            return 0
        ids = self._matching_tag_set_ids(sorted(set(tags)))
        if not ids:
            return 0
        # victim count from parquet FOOTERS of the doomed directories — row
        # counts are free metadata; no data pages are read (the reference
        # returns the count from its in-memory index, db.rs:629-643)
        n = 0
        for tsid in ids:
            part_dir = fsjoin(self.data_path, f"tag_set_id={tsid}")
            if not self.fs.is_dir(part_dir):
                continue
            n += self.fs.parquet_row_count(part_dir)
            self.fs.delete(part_dir)
        doomed = set(ids)
        survivors = [
            (tsid, ts)
            for tsid, ts in (self._read_tag_sets() or [])
            if tsid not in doomed
        ]
        self._write_tag_sets(survivors)
        remaining = [
            d for d in self.fs.listdir(self.data_path)
            if d.startswith("tag_set_id=")
        ]
        if not remaining:
            self.clear()
        # deletion changes MEMBERSHIP: a PQ/IVF serving table built earlier
        # would keep answering with the deleted rows — worse than the
        # acceptable "stale-missing" of post-build inserts. Drop the
        # artifacts; callers rebuild when they next need the ANN path.
        self._drop_ann_artifacts()
        return n

    def delete_ids(self, ids: list[str]) -> int:
        """Row-level delete by id. Returns the number of rows deleted.

        An extension (the reference's only deletion is clear_db; our
        delete(tags) drops whole partitions): ids don't map to partitions,
        so victims are located with ONE column-pruned scan over (id,
        tag_set_id), then ONLY the partitions that hold victims are
        rewritten (filter + per-directory swap) — every other partition's
        files are untouched. A partition whose rows are all victims is
        dropped directory-wise like delete(tags), with the metadata
        listing updated.

        Scale shape: the locate scan reads two thin columns of the corpus
        (inherent without an id→partition index); the id set rides as an
        IN-filter here — a large victim set would instead broadcast as an
        anti-join, same plan shape. Rewrite cost is proportional to the
        AFFECTED partitions only, the same contract as DELETE on a
        hive-layout table. Membership changed, so ANN serving artifacts
        are dropped (callers rebuild on next use).

        Crash contract (same as compact's directory swap): the temp and
        backup directories live OUTSIDE data_path, so an interrupted swap
        can lose the one partition mid-rename but can never leave ghost
        directories that a later scan would read as live partitions. On
        object stores the swap is the documented non-atomic
        delete→rename (victor_spark/fs.py module docstring).
        """
        if not ids or self.is_empty():
            return 0
        idset = sorted(set(ids))
        df = self.spark.read.parquet(self.data_path)
        affected = (
            df.select("id", "tag_set_id")
            .filter(F.col("id").isin(idset))
            .groupBy("tag_set_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if not affected:
            return 0
        emptied: set[str] = set()
        n_victims = 0
        # temp/backup live OUTSIDE data_path: a suffix inside it would be
        # discovered by the next scan as a (ghost) partition directory
        tmp = self.data_path + "__del_tmp"
        old = self.data_path + "__del_old"
        for r in affected:
            tsid, n_vic = r["tag_set_id"], r["n"]
            n_victims += n_vic
            part_dir = fsjoin(self.data_path, f"tag_set_id={tsid}")
            if self.fs.parquet_row_count(part_dir) == n_vic:
                # every row is a victim: drop the directory, no rewrite
                self.fs.delete(part_dir)
                emptied.add(tsid)
                continue
            kept = self.spark.read.parquet(part_dir).filter(
                ~F.col("id").isin(idset)
            )
            self.fs.delete(tmp)
            kept.write.mode("overwrite").parquet(tmp)
            self.fs.delete(old)
            self.fs.rename(part_dir, old)
            self.fs.rename(tmp, part_dir)
            self.fs.delete(old)
        if emptied:
            survivors = [
                (tsid, ts)
                for tsid, ts in (self._read_tag_sets() or [])
                if tsid not in emptied
            ]
            self._write_tag_sets(survivors)
        remaining = [
            d for d in self.fs.listdir(self.data_path)
            if d.startswith("tag_set_id=")
        ]
        if not remaining:
            self.clear()
        else:
            self._drop_ann_artifacts()
        return n_victims

    # -- scan --------------------------------------------------------------

    def is_empty(self) -> bool:
        return not self.fs.exists(self.data_path)

    def scan(self, tags: list[str] | None = None) -> DataFrame:
        """Dequantized view of the stored rows, partition-pruned by
        tag-superset (reference get_matching_db_files, db.rs:687-706:
        a stored tag-set matches iff it ⊇ the query tags; empty query
        matches everything).

        The superset predicate is evaluated over the tag-set METADATA
        listing (a few-hundred-row parquet read driver-side — no Spark job,
        no data scan) and turned into an IN-list on the partition column,
        so the parquet scan prunes directories exactly like the reference
        selects files from index.bin."""
        df = self.spark.read.parquet(self.data_path)
        if tags:
            listing = self._matching_tag_set_ids(sorted(set(tags)))
            if not listing:
                df = df.filter(F.lit(False))
            else:
                df = df.filter(F.col("tag_set_id").isin(listing))
        bins = F.transform(F.col("quant"), lambda b: b.cast("int") + 128)
        return df.withColumn("embedding", dequantize(bins, "qmin", "qmax"))

    def dimension(self) -> int | None:
        if self.is_empty():
            return None
        row = self.spark.read.parquet(self.data_path).select(F.size("quant").alias("d")).first()
        return row["d"] if row else None

    # -- search ------------------------------------------------------------

    def search(self, query: list[float], k: int = 10,
               tags: list[str] | None = None,
               strict_nan: bool = True) -> DataFrame:
        """Top-k nearest neighbors (reference search_embedding,
        db.rs:217-283). Returns (id, content, tags, score) — cosine
        descending, or euclidean ascending in projected mode.

        Plan: pruned scan → dequantize → score (codegen) →
        TakeOrderedAndProject(k) — the reference's bounded heap,
        distributed.

        An empty index returns an empty result (the reference's search over
        a fresh DB yields an empty vec — db.rs:229-231 loads an empty index
        and selects no files), not a scan error on the missing path.

        NaN policy (reference NearestNeighborsResult::cmp panics on NaN
        similarity, db.rs:742-748): with ``strict_nan`` a NaN score (a
        zero-norm vector under cosine, or NaN inputs) fails the job —
        the distributed mirror of the panic. ``strict_nan=False`` drops
        NaN-scored rows instead, for callers that prefer skip-and-serve."""
        if self.is_empty():
            return self.spark.createDataFrame(
                [], "id string, content string, tags array<string>, score double"
            )
        model = self._load_model()
        df = self.scan(tags)
        q = [float(x) for x in query]
        if model is not None:
            q = model.project_vector(q)
            score = euclidean_to_literal("embedding", q)
        else:
            score = cosine_to_literal("embedding", q)
        if strict_nan:
            score = F.when(
                F.isnan(score),
                F.raise_error(F.lit("NaN similarity score (strict NaN mode)")),
            ).otherwise(score)
        else:
            df = df.filter(~F.isnan(score))
        scored = topk(df, score, k, ascending=model is not None)
        return scored.select("id", "content", "tags", "score")

    def search_batch(self, queries: dict[str, list[float]], k: int = 10,
                     tags: list[str] | None = None,
                     strict_nan: bool = True) -> DataFrame:
        """Top-k for a SET of query vectors in one dataflow (extension —
        the reference serves one query per call). Returns
        (query_id, id, content, tags, score, rank), rank 1..k per query.

        The throughput shape: the pruned scan happens ONCE and every query
        scores against it via a broadcast crossJoin of the (tiny) query
        table, ranked per query by a WindowGroupLimit — N queries share one
        corpus scan instead of N scans (same plan as the catalog's
        ann_ivf_batch/topk_batch, surfaced on the index API). Scores follow
        search(): cosine descending, or euclidean ascending in projected
        mode (queries are projected first).
        """
        from victor_spark.operators.topk import topk_per_group

        if not queries:
            raise ValueError("search_batch needs at least one query")
        if self.is_empty():
            return self.spark.createDataFrame(
                [], "query_id string, id string, content string, "
                    "tags array<string>, score double, rank int"
            )
        model = self._load_model()
        qrows = [(qid, [float(x) for x in (model.project_vector(v)
                                           if model is not None else v)])
                 for qid, v in sorted(queries.items())]
        qdf = F.broadcast(self.spark.createDataFrame(
            qrows, "query_id string, _qv array<double>"
        ))
        df = self.scan(tags).crossJoin(qdf)
        score = (euclidean("embedding", "_qv") if model is not None
                 else cosine("embedding", "_qv"))
        df = df.withColumn("score", score)
        if strict_nan:
            df = df.withColumn(
                "score",
                F.when(
                    F.isnan("score"),
                    F.raise_error(F.lit("NaN similarity score (strict NaN mode)")),
                ).otherwise(F.col("score")),
            )
        else:
            df = df.filter(~F.isnan("score"))
        ranked = topk_per_group(
            df, ["query_id"], "score", k,
            ascending=model is not None, tie_cols=["id"],
        )
        return ranked.select(
            "query_id", "id", "content", "tags", "score", "rank"
        )

    # -- PQ serving path (extension; see operators/pq.py) -------------------

    def build_pq(self, m: int = 8, n_codes: int = 16,
                 trainer: str = "sample", train_iters: int = 10,
                 seed_col: str = "id") -> None:
        """Build (or refresh) the product-quantization serving table: a
        deterministic codebook over the stored vectors plus an
        ``(id, pq_code)`` parquet of per-subvector codes.

        A maintenance artifact exactly like the PCA model — rebuild after
        batch loads; searches between build and rebuild serve the codes as
        of the last build. At scale this is the point: ``search_pq`` scans
        m bytes/row instead of the float vectors, with the codebook+LUT
        driver-side (O(n_codes·d)).

        ``trainer="sample"`` (default) keeps the deterministic salted-md5
        row codebook (oracle-replayable in SQL); ``trainer="kmeans"`` runs
        ``train_iters`` Lloyd rounds from the same deterministic init —
        better quantization error, same serving algebra.

        ``seed_col``: the column whose salted md5 drives the
        deterministic init. The default ``"id"`` is stable within one
        index lifetime but ids are minted per insert, so REBUILDING an
        identical corpus draws a different init; pass ``"content"`` (or
        any column stable across re-inserts and unique per row) for
        cross-run reproducible codebooks.
        """
        from victor_spark.operators import pq

        if seed_col == "embedding":
            raise ValueError(
                "seed_col must name a scalar identity column (e.g. 'id' "
                "or 'content'), not the vector column"
            )
        if self.is_empty():
            raise ValueError("cannot build PQ over an empty index")
        dim = self.dimension()
        if dim % m != 0:
            raise ValueError(f"dimension {dim} not divisible by m={m}")
        cols = ["id", "embedding"] + ([seed_col] if seed_col != "id" else [])
        full = self.scan().select(*cols)
        cb = self._train_codebook(full, n_codes, trainer, train_iters,
                                  metric="l2", salt="pq", seed_col=seed_col)
        full = full.select("id", "embedding")
        enc = pq.encode(full, "embedding", cb, m=m).select("id", "pq_code")
        tmp = self.pq_path + "__building"
        self.fs.delete(tmp)
        enc.write.mode("overwrite").parquet(tmp)
        self.fs.replace(tmp, self.pq_path)
        self._write_json(self.pq_meta_path, {"m": m, "codebook": cb})

    def _train_codebook(self, df, k: int, trainer: str, train_iters: int,
                        metric: str, salt: str,
                        seed_col: str = "id") -> list[list[float]]:
        """Model rows for an ANN artifact: the deterministic salted-md5
        sample (oracle-replayable) or Lloyd-refined centroids from that
        same init (better recall at equal serving cost; operators/kmeans).
        ``seed_col`` picks the column the init hashes (see build_pq)."""
        from victor_spark.operators import kmeans, pq

        if trainer == "sample":
            return pq.codebook_vectors(df, seed_col, "embedding", k=k,
                                       salt=salt)
        if trainer == "kmeans":
            return kmeans.fit_kmeans(df, seed_col, "embedding", k=k,
                                     max_iter=train_iters, metric=metric,
                                     salt=salt)
        raise ValueError(f"trainer must be sample|kmeans, got {trainer!r}")

    def search_pq(self, query: list[float], k: int = 10,
                  tags: list[str] | None = None) -> DataFrame:
        """Approximate top-k by asymmetric distance: smallest ADC squared
        L2 first. Returns (id, content, tags, adc_dist). Requires
        :meth:`build_pq`; candidates join back to the content store
        broadcast-wise, like the exact path's P7 content lookup.

        ``tags`` restricts to rows whose tag-set ⊇ tags — a semi-join of
        the code table against the tag-PRUNED data's id column BEFORE
        scoring, so the top-k is exact within the tag scope (not a lossy
        post-filter) and the id set comes from pruned partitions only."""
        if not self.fs.exists(self.pq_meta_path):
            raise ValueError("no PQ table built; call build_pq() first")
        from victor_spark.operators import pq

        meta = self._read_json(self.pq_meta_path)
        q = [float(x) for x in query]
        model = self._load_model()
        if model is not None:
            # codes were built over the PROJECTED space (build_pq reads
            # scan()); the query must travel the same path as search()
            if len(q) != model.components.shape[0]:
                raise DimensionMismatchError(
                    f"query dimension {len(q)} vs model input "
                    f"dimension {model.components.shape[0]}"
                )
            q = model.project_vector(q)
        if len(q) != len(meta["codebook"][0]):
            raise DimensionMismatchError(
                f"query dimension {len(q)} vs PQ codebook "
                f"dimension {len(meta['codebook'][0])}"
            )
        codes = self.spark.read.parquet(self.pq_path)
        if tags:
            allowed = self.scan(tags).select("id")
            codes = codes.join(allowed, "id", "leftsemi")
        hits = pq.adc_topk(
            codes, q, meta["codebook"], k=k, m=meta["m"], id_col="id",
        )
        content = self.spark.read.parquet(self.data_path).select(
            "id", "content", "tags"
        )
        return F.broadcast(hits).join(content, "id").select(
            "id", "content", "tags", "adc_dist"
        ).orderBy(F.asc("adc_dist"), F.asc("id"))

    def build_ivf(self, n_cells: int = 64,
                  trainer: str = "sample", train_iters: int = 10,
                  seed_col: str = "id") -> None:
        """Materialize the inverted-file serving table: rows rewritten
        PARTITIONED BY their nearest-centroid cell, centroids persisted
        driver-side. ``search_ivf`` then probes nprobe cells as parquet
        partition pruning — the scan literally never opens the other
        cells' files, which is the IVF promise expressed in Spark's own
        storage idiom (same trick as the tag_set_id layout, §1.3/P4).

        ``trainer="sample"`` (default): the n_cells stored rows with the
        smallest salted md5 of id (deterministic, oracle-replayable).
        ``trainer="kmeans"``: spherical Lloyd from that same init — cells
        follow the corpus density, worth ~+0.1 recall@10 at equal nprobe
        (tests/test_kmeans.py measures it). A maintenance artifact —
        rebuild after batch loads.
        """
        if seed_col == "embedding":
            raise ValueError(
                "seed_col must name a scalar identity column (e.g. 'id' "
                "or 'content'), not the vector column"
            )
        if self.is_empty():
            raise ValueError("cannot build IVF over an empty index")
        full = self.scan().select("id", "content", "tags", "embedding")
        seed_cols = ["id", "embedding"] + (
            [seed_col] if seed_col != "id" else []
        )
        cents = self._train_codebook(full.select(*seed_cols), n_cells,
                                     trainer, train_iters,
                                     metric="cosine", salt="ivf",
                                     seed_col=seed_col)
        cent_df = F.broadcast(
            self.spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "cell int, cv array<double>",
            )
        )
        scored = full.crossJoin(cent_df).withColumn(
            "_cs", cosine("embedding", "cv")
        )
        # argmax cell as a max_by aggregation (tie → lowest cell): partial
        # aggregation combines map-side, one shuffled row per id — cheaper
        # than a window's full sort of every (row, centroid) pair
        assigned = scored.groupBy("id").agg(
            F.first("content").alias("content"),
            F.first("tags").alias("tags"),
            F.first("embedding").alias("embedding"),
            F.max_by("cell", F.struct(F.col("_cs"), -F.col("cell"))).alias("cell"),
        ).select("id", "content", "tags", "embedding", "cell")
        tmp = self.ivf_path + "__building"
        self.fs.delete(tmp)
        assigned.write.mode("overwrite").partitionBy("cell").parquet(tmp)
        self.fs.replace(tmp, self.ivf_path)
        self._write_json(self.ivf_meta_path, {"centroids": cents})

    def search_ivf(self, query: list[float], k: int = 10,
                   nprobe: int = 2,
                   tags: list[str] | None = None) -> DataFrame:
        """Approximate top-k cosine over the IVF layout: rank cells by
        query-centroid cosine DRIVER-side (n_cells tiny), scan only the
        nprobe best cells (parquet partition pruning), exact cosine within.
        Returns (id, content, tags, score) like :meth:`search`.

        In projected mode the query is projected first (same path as
        search), but the IVF space stays COSINE end-to-end — cells were
        assigned and are probed by cosine over the projected vectors — so
        scores are cosine even where search() reports euclidean ascending;
        a consistent metric within the ANN path beats mirroring the
        reference's metric switch halfway through an index."""
        import math

        if not self.fs.exists(self.ivf_meta_path):
            raise ValueError("no IVF table built; call build_ivf() first")
        cents = self._read_json(self.ivf_meta_path)["centroids"]
        q = [float(x) for x in query]
        model = self._load_model()
        if model is not None:
            # cells were assigned over the projected space; project the
            # query exactly as search() does
            if len(q) != model.components.shape[0]:
                raise DimensionMismatchError(
                    f"query dimension {len(q)} vs model input "
                    f"dimension {model.components.shape[0]}"
                )
            q = model.project_vector(q)
        if len(q) != len(cents[0]):
            raise DimensionMismatchError(
                f"query dimension {len(q)} vs IVF centroid dimension {len(cents[0])}"
            )
        qn = math.sqrt(sum(x * x for x in q)) or float("nan")

        def cos(c):
            cn = math.sqrt(sum(x * x for x in c))
            if cn == 0 or qn != qn:
                return float("-inf")
            return sum(a * b for a, b in zip(c, q)) / (cn * qn)

        cells = sorted(range(len(cents)), key=lambda i: (-cos(cents[i]), i))
        probe = cells[:max(1, nprobe)]
        df = self.spark.read.parquet(self.ivf_path).filter(
            F.col("cell").isin(probe)
        )
        if tags:
            # the IVF table carries the tags column, so the tag-superset
            # predicate applies directly inside the probed-cell scan —
            # exact within scope, no extra join
            query_tags = sorted(set(tags))
            df = df.filter(
                F.forall(
                    F.array(*[F.lit(t) for t in query_tags]),
                    lambda t: F.array_contains(F.col("tags"), t),
                )
            )
        score = cosine_to_literal("embedding", q)
        scored = df.select("id", "content", "tags", score.alias("score"))
        return topk(scored, F.col("score"), k, ascending=False)

    def build_ivfpq(self, m: int = 8, n_codes: int = 16,
                    n_cells: int = 64,
                    trainer: str = "sample", train_iters: int = 10,
                    seed_col: str = "id") -> None:
        """Materialize the IVF-PQ serving table (operators/ivfpq.py, the
        FAISS-standard composition): rows assigned to nearest-centroid
        cells, RESIDUALS (v − centroid) product-quantized, and the
        ``(id, cell, pq_code)`` table written partitionBy(cell) so a probe
        is directory pruning over an m-bytes/vector code column.

        ``trainer="sample"`` (default): deterministic centroids
        ('ivfpq-cent' salt rule: smallest salted md5 of id) and residual
        codebook ('ivfpq-cb'), standing in for k-means like
        build_pq/build_ivf. ``trainer="kmeans"``: spherical Lloyd for the
        cells, then L2 Lloyd over the RESIDUALS for the codebook — the
        FAISS training recipe. A maintenance artifact — rebuild after
        batch loads. ``seed_col`` picks the column the deterministic
        inits hash (build_pq's reproducibility contract: ids are minted
        per insert, so pass a stable unique column like ``"content"``
        for identical codebooks across re-ingests of the same corpus)."""
        import math

        from victor_spark.operators import pq as PQ

        if seed_col == "embedding":
            raise ValueError(
                "seed_col must name a scalar identity column (e.g. 'id' "
                "or 'content'), not the vector column"
            )
        if self.is_empty():
            raise ValueError("cannot build IVF-PQ over an empty index")
        dim = self.dimension()
        if dim % m != 0:
            raise ValueError(f"dimension {dim} not divisible by m={m}")
        seed_cols = ["id", "embedding"] + (
            [seed_col] if seed_col != "id" else []
        )
        full = self.scan().select(*seed_cols)
        if trainer == "kmeans":
            self._build_ivfpq_kmeans(full, m, n_codes, n_cells, train_iters,
                                     seed_col=seed_col)
            return
        # one collect for both model artifacts: centroid rows + codebook rows
        tagged = full.select(
            "id", "embedding",
            F.conv(F.substring(F.md5(F.concat(F.lit("ivfpq-cent:"), F.col(seed_col).cast("string"))), 1, 8),
                   16, 10).cast("long").alias("_hc"),
            F.conv(F.substring(F.md5(F.concat(F.lit("ivfpq-cb:"), F.col(seed_col).cast("string"))), 1, 8),
                   16, 10).cast("long").alias("_hb"),
        )
        cent_part = tagged.orderBy("_hc", "id").limit(n_cells).select(
            "id", "embedding", F.lit("cent").alias("_part")
        )
        cb_part = tagged.orderBy("_hb", "id").limit(n_codes).select(
            "id", "embedding", F.lit("cb").alias("_part")
        )
        rows = cent_part.unionAll(cb_part).collect()
        cents = [
            [float(x) for x in r["embedding"]]
            for r in sorted((r for r in rows if r["_part"] == "cent"),
                            key=lambda r: r["id"])
        ]
        cb_vecs = [
            [float(x) for x in r["embedding"]]
            for r in sorted((r for r in rows if r["_part"] == "cb"),
                            key=lambda r: r["id"])
        ]

        def _cos(a, b):
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            if na == 0 or nb == 0:
                return float("-inf")
            return sum(x * y for x, y in zip(a, b)) / (na * nb)

        def _cell_of(v):
            return min(range(len(cents)), key=lambda i: (-_cos(v, cents[i]), i))

        codebook = [
            [x - c for x, c in zip(v, cents[_cell_of(v)])] for v in cb_vecs
        ]
        self._write_ivfpq(full, cents, codebook, m)

    def _assign_cells_with_residuals(self, full: DataFrame,
                                     cents: list[list[float]],
                                     carry: tuple[str, ...] = ()) -> DataFrame:
        """(id, cell, _r [, carry...]): nearest-centroid cell by cosine
        (ties → lowest cell) and the residual vector — the shared IVF-PQ
        assignment job. ``carry`` names extra ``full`` columns to keep
        (e.g. the reproducible-seed column the residual-codebook trainer
        hashes).

        Argmax as a max_by aggregation carrying the winning (cell, cv)
        struct (tie → lowest cell): map-side partial aggregation, one
        shuffled row per id, residual computed after the pick."""
        cent_df = F.broadcast(self.spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, cv array<double>"
        ))
        scored = full.crossJoin(cent_df).withColumn(
            "_cs", cosine("embedding", "cv")
        )
        best = scored.groupBy("id").agg(
            F.first("embedding").alias("embedding"),
            *[F.first(c).alias(c) for c in carry],
            F.max_by(
                F.struct("cell", "cv"), F.struct(F.col("_cs"), -F.col("cell"))
            ).alias("_best"),
        )
        return best.select(
            "id", *carry, F.col("_best.cell").alias("cell"),
            F.zip_with(
                "embedding", F.col("_best.cv"), lambda x, y: x - y
            ).alias("_r"),
        )

    def _write_ivfpq(self, full: DataFrame, cents: list[list[float]],
                     codebook: list[list[float]], m: int,
                     assigned: DataFrame | None = None) -> None:
        from victor_spark.operators import pq as PQ

        if assigned is None:
            assigned = self._assign_cells_with_residuals(full, cents)
        enc = PQ.encode(assigned, "_r", codebook, m=m).select("id", "cell", "pq_code")
        tmp = self.ivfpq_path + "__building"
        self.fs.delete(tmp)
        enc.write.mode("overwrite").partitionBy("cell").parquet(tmp)
        self.fs.replace(tmp, self.ivfpq_path)
        self._write_json(
            self.ivfpq_meta_path,
            {"m": m, "centroids": cents, "codebook": codebook},
        )

    def _build_ivfpq_kmeans(self, full: DataFrame, m: int, n_codes: int,
                            n_cells: int, train_iters: int,
                            seed_col: str = "id") -> None:
        """FAISS-recipe training: spherical k-means for the coarse cells,
        then L2 k-means over the residuals for the shared codebook."""
        from victor_spark.operators import kmeans

        cents = kmeans.fit_kmeans(full, seed_col, "embedding", k=n_cells,
                                  max_iter=train_iters, metric="cosine",
                                  salt="ivfpq-cent")
        # the assignment job is the corpus-sized part of the build; compute
        # it once and feed both the codebook trainer and the encode/write,
        # carrying the seed column so the residual-codebook init follows
        # the same reproducibility contract as the coarse cells
        carry = (seed_col,) if seed_col != "id" else ()
        residuals = self._assign_cells_with_residuals(
            full, cents, carry=carry
        ).localCheckpoint()
        codebook = kmeans.fit_kmeans(residuals, seed_col, "_r", k=n_codes,
                                     max_iter=train_iters, metric="l2",
                                     salt="ivfpq-cb")
        self._write_ivfpq(full, cents, codebook, m, assigned=residuals)

    def search_ivfpq(self, query: list[float], k: int = 10,
                     nprobe: int = 2,
                     tags: list[str] | None = None) -> DataFrame:
        """Approximate top-k by IVF-PQ asymmetric distance: rank cells
        driver-side, scan only the nprobe best cells' code partitions, and
        score each with the query-residual LUT for that cell. Returns
        (id, content, tags, adc_dist ascending). Requires
        :meth:`build_ivfpq`. ``tags`` scopes to tag-superset rows via a
        pre-scoring semi-join (exact within scope)."""
        import math

        from victor_spark.functions.vector import bind
        from victor_spark.operators import pq as PQ

        if not self.fs.exists(self.ivfpq_meta_path):
            raise ValueError("no IVF-PQ table built; call build_ivfpq() first")
        meta = self._read_json(self.ivfpq_meta_path)
        cents, codebook, m = meta["centroids"], meta["codebook"], meta["m"]
        q = [float(x) for x in query]
        model = self._load_model()
        if model is not None:
            if len(q) != model.components.shape[0]:
                raise DimensionMismatchError(
                    f"query dimension {len(q)} vs model input "
                    f"dimension {model.components.shape[0]}"
                )
            q = model.project_vector(q)
        if len(q) != len(cents[0]):
            raise DimensionMismatchError(
                f"query dimension {len(q)} vs IVF-PQ centroid dimension {len(cents[0])}"
            )
        qn = math.sqrt(sum(x * x for x in q)) or float("nan")

        def _cos(c):
            cn = math.sqrt(sum(x * x for x in c))
            if cn == 0 or qn != qn:
                return float("-inf")
            return sum(a * b for a, b in zip(c, q)) / (cn * qn)

        probe = sorted(range(len(cents)), key=lambda i: (-_cos(cents[i]), i))[
            : max(1, nprobe)
        ]
        codes = self.spark.read.parquet(self.ivfpq_path).filter(
            F.col("cell").isin(probe)
        )
        if tags:
            # semi-join against the tag-pruned data ids BEFORE scoring
            # (same exact-within-scope contract as search_pq)
            allowed = self.scan(tags).select("id")
            codes = codes.join(allowed, "id", "leftsemi")

        def _score_for(lut):
            lut_lit = lit_doubles_2d(lut)

            def _s(lut_b):
                score = None
                for j in range(m):
                    term = F.element_at(
                        F.element_at(lut_b, j + 1),
                        F.element_at(F.col("pq_code"), j + 1),
                    )
                    score = term if score is None else score + term
                return score

            return bind(lut_lit, _s)

        score = None
        for c in probe:
            lut = PQ.adc_lut(
                [qx - cx for qx, cx in zip(q, cents[c])], codebook, m
            )
            s = _score_for(lut)
            cond = F.col("cell") == c
            score = F.when(cond, s) if score is None else score.when(cond, s)

        hits = (
            codes.select("id", score.alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc("id"))
            .limit(k)
        )
        content = self.spark.read.parquet(self.data_path).select(
            "id", "content", "tags"
        )
        return F.broadcast(hits).join(content, "id").select(
            "id", "content", "tags", "adc_dist"
        ).orderBy(F.asc("adc_dist"), F.asc("id"))

    # -- interchange --------------------------------------------------------

    def export_jsonl(self, path: str, tags: list[str] | None = None) -> None:
        """Export (id, content, tags, embedding) as JSON Lines.

        Embeddings are dequantized to doubles — the standard corpus
        interchange shape for downstream training pipelines. The export is
        a distributed write (one shard per partition); no driver collect.
        """
        from victor_spark.sources.formats import write_jsonl

        write_jsonl(
            self.scan(tags).select("id", "content", "tags", "embedding"), path
        )

    def import_jsonl(self, path: str) -> None:
        """Insert records from JSON Lines with (content, embedding, tags).

        Schema is explicit (no inference pass over the input); rows flow
        through :meth:`insert_df`, so dimension checks, tag normalization,
        quantization, and the projected-insert path all apply.
        """
        from victor_spark.sources.formats import read_jsonl

        df = read_jsonl(
            self.spark,
            path,
            "content string, embedding array<double>, tags array<string>",
        )
        self.insert_df(df)

    def merge_from(self, other: "VectorIndex") -> int:
        """Fold another index's rows into this one — the shard-merge step
        of parallel ingest (N workers each build a private shard index
        with no listing contention, then one merge per shard; the
        single-writer listing contract holds trivially because only the
        merger writes). Returns the number of rows merged.

        The stored rows move AS-IS — one distributed partitioned append
        of the already-quantized table (no dequantize/requantize round
        trip, so no second quantization error) — and the tag-set
        listings union. Works across filesystems (a local shard can
        merge into an hdfs:// index; the append is a Spark job either
        way). Both indexes must agree on dimension and on projection
        state (same PCA model or both unprojected — merging differently
        projected spaces would corrupt scoring). ANN serving artifacts
        are dropped here: membership changed (same contract as delete).
        """
        # identity first — pure path canonicalization, no FS access (some
        # alias spellings, e.g. a file://localhost authority, are caught
        # here but rejected outright by the Hadoop local FS)
        if _canon_path(self.path) == _canon_path(other.path):
            raise ValueError("cannot merge an index into itself")
        if other.is_empty():
            return 0
        if not self.is_empty():
            d_self, d_other = self.dimension(), other.dimension()
            if d_self != d_other:
                raise DimensionMismatchError(
                    f"cannot merge dimension {d_other} into {d_self}"
                )
            m_self, m_other = self._load_model(), other._load_model()
            if (m_self is None) != (m_other is None):
                raise ValueError(
                    "cannot merge a projected index with an unprojected one"
                )
            if m_self is not None and not (
                (m_self.components == m_other.components).all()
                and (m_self.means == m_other.means).all()
            ):
                raise ValueError(
                    "cannot merge indexes projected with different PCA models"
                )
        elif other._load_model() is not None:
            # empty target adopts the shard's projection state
            self.fs.write_bytes_atomic(
                self.model_path, other.fs.read_bytes(other.model_path)
            )
        # row count from parquet FOOTERS of the shard's partitions — free
        # metadata, no scan job (same mechanism as delete/delete_ids)
        n = sum(
            other.fs.parquet_row_count(fsjoin(other.data_path, d))
            for d in other.fs.listdir(other.data_path)
            if d.startswith("tag_set_id=")
        )
        self._staged_append(other.spark.read.parquet(other.data_path))
        # data first, then metadata (same ordering contract as insert_df)
        theirs = other._read_tag_sets() or other._derive_tag_sets()
        self._register_tag_sets({tuple(ts) for _tsid, ts in theirs})
        self._drop_ann_artifacts()
        return n

    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Remove maintenance debris a crash can leave behind: staging
        directories from interrupted ANN builds / compactions / row-level
        deletes / projections, retired ``__old`` backups, and orphaned
        ``.tmp`` artifact files. Returns the paths removed.

        Safe by construction: every maintenance writer stages under a
        suffix OUTSIDE the live paths (``__building``, ``__compacting``,
        ``__del_tmp``/``__del_old``, ``__old``, ``.projected``, ``.tmp``)
        precisely so that no crash leaves half-written state inside a
        directory readers scan — vacuum just reclaims the disk.

        AGE GATE: only debris whose modification time is older than
        ``min_age_seconds`` (default 1 h) is reclaimed, so the documented
        no-active-writer contract cannot be violated by accident — a
        concurrent insert/compact/delete owns a staging or backup
        directory that is by definition FRESH, and vacuum leaves it
        alone. Pass ``min_age_seconds=0`` only when no writer of any
        kind can be active. Interrupted-but-completable insert staging
        (``__staging`` with a ``_SUCCESS`` marker) is better served by
        :meth:`recover_staged` first — vacuum abandons the remainder."""
        import time as _time

        debris_suffixes = ("__building", "__compacting", "__del_tmp",
                           "__del_old", "__old", ".projected", ".tmp",
                           "__staging")
        removed = []
        if not self.fs.exists(self.path):
            return removed
        now = _time.time()
        for name in self.fs.listdir(self.path):
            # a lock-break claimant that crashed between its victim
            # rename and delete leaves lock__stale_<uuid> debris no
            # acquire path ever looks at — sweep it here (age-gated
            # like everything else)
            if name.endswith(debris_suffixes) or "__stale_" in name:
                p = fsjoin(self.path, name)
                try:
                    if now - self.fs.mtime(p) < min_age_seconds:
                        continue  # fresh — likely a live writer's staging
                except Exception:
                    continue  # vanished since listdir (owner cleaned up)
                self.fs.delete(p)
                removed.append(p)
        return removed

    # -- PCA maintenance (db.rs:287-299, trigger :551-553) ------------------

    def storage_bytes(self) -> int:
        return sum(size for _p, size in self.fs.file_sizes(self.data_path))

    def stats(self) -> list[dict]:
        """Per-tag-set accounting from METADATA only — the listing gives
        (tag_set_id, tags), parquet footers give row counts, the directory
        gives bytes and file counts. Zero data pages read (the ANALYZE
        a 100 TB table can afford); rows sorted by tag_set_id."""
        if self.is_empty():
            return []
        listing = self._read_tag_sets()
        if listing is None:
            listing = self._derive_tag_sets()
            self._write_tag_sets(sorted(listing))
        else:
            listing = self._reconcile_tag_sets(listing)
        out = []
        for tsid, tags in sorted(listing):
            part_dir = fsjoin(self.data_path, f"tag_set_id={tsid}")
            n_rows = n_files = n_bytes = 0
            if self.fs.is_dir(part_dir):
                for fname in self.fs.listdir(part_dir):
                    if fname.endswith(".parquet"):
                        fpath = fsjoin(part_dir, fname)
                        n_rows += self.fs.parquet_row_count(fpath)
                        n_bytes += self.fs.file_size(fpath)
                        n_files += 1
            out.append({
                "tag_set_id": tsid, "tags": list(tags),
                "rows": n_rows, "files": n_files, "bytes": n_bytes,
            })
        return out

    def compact(self, target_rows_per_file: int = 1_000_000,
                sort_within: str | list[str] | None = None) -> dict:
        """Rewrite the table with size-targeted files per tag partition —
        the OPTIMIZE-style maintenance job that pairs with maybe_project
        (the reference's only maintenance hook is its PCA trigger,
        db.rs:551-553; it never compacts its append-only files).

        Streaming/batch appends leave one file per (batch, tag) — at scale
        that's the classic small-file problem: open/seek overhead per file
        dominates the scan and partition listing slows planning. Each tag
        set is re-split into ceil(rows/target) groups via a salted hash of
        the row id, so every output group lands wholly in one task → one
        file of ~target rows, deterministic layout, no global shuffle
        beyond the one repartition.

        ``sort_within`` additionally sorts rows by the given column(s)
        inside each output task, so every written file carries tight
        parquet min/max statistics on those columns — the clustering leg
        of OPTIMIZE: a later scan filtering on a sorted column skips whole
        files/row groups from footers alone.

        Directory swap: write temp, rename over (self.fs — on object
        stores the rename pair is the documented non-atomic window,
        victor_spark/fs.py). Returns {"files_before", "files_after",
        "rows"}.
        """
        def _count_files(p: str) -> int:
            return sum(
                1 for fp, _s in self.fs.file_sizes(p) if fp.endswith(".parquet")
            )

        if self.is_empty():
            return {"files_before": 0, "files_after": 0, "rows": 0}
        df = self.spark.read.parquet(self.data_path)
        files_before = _count_files(self.data_path)
        rows = df.count()
        # per-tag row counts: map-side-partial agg, broadcast back (the tag
        # dimension is small even when the fact table is 100 TB)
        counts = df.groupBy("tag_set_id").agg(F.count("*").alias("__n"))
        n_groups = F.greatest(
            F.lit(1), F.ceil(F.col("__n") / target_rows_per_file)
        )
        if sort_within:
            # clustering mode: the SPLIT itself must be range-based on the
            # sort columns (a salted hash split would scatter each value
            # range across every file, leaving overlapping min/max stats),
            # then rows are ordered inside each task for row-group-tight
            # statistics
            import math as _math

            cols = ([sort_within] if isinstance(sort_within, str)
                    else list(sort_within))
            n_parts = max(1, _math.ceil(rows / target_rows_per_file))
            out = df.repartitionByRange(
                n_parts, F.col("tag_set_id"), *[F.col(c) for c in cols]
            ).sortWithinPartitions("tag_set_id", *cols)
        else:
            out = (
                df.join(F.broadcast(counts), "tag_set_id")
                .withColumn(
                    "__grp",
                    F.pmod(
                        F.conv(F.substring(F.md5(F.col("id")), 1, 8), 16, 10).cast("long"),
                        n_groups,
                    ),
                )
                .repartition("tag_set_id", "__grp")
                .drop("__grp", "__n")
            )
        tmp = self.data_path + "__compacting"
        self.fs.delete(tmp)
        # the salted repartition buys write parallelism on a huge tag; the
        # writer's maxRecordsPerFile enforces the per-file bound even when
        # AQE coalesces the (tag, group) shuffle partitions into fewer tasks
        out.write.mode("overwrite").option(
            "maxRecordsPerFile", target_rows_per_file
        ).partitionBy("tag_set_id").parquet(tmp)
        old = self.data_path + "__old"
        self.fs.delete(old)
        self.fs.rename(self.data_path, old)
        self.fs.rename(tmp, self.data_path)
        self.fs.delete(old)
        return {
            "files_before": files_before,
            "files_after": _count_files(self.data_path),
            "rows": rows,
        }

    def maybe_project(self, threshold_bytes: int = 1_000_000, k: int = 500) -> bool:
        """Storage-pressure hook: if the table exceeds the threshold and is
        not yet projected, fit PCA on all vectors, persist the model, and
        rewrite the table projected (reference: wasm ∧ file>1MB ∧
        ¬projected, db.rs:551-553)."""
        if self._load_model() is not None or self.is_empty():
            return False
        if self.storage_bytes() <= threshold_bytes:
            return False
        self.project(k)
        return True

    def project(self, k: int = 500) -> PCAModel:
        """Fit + persist + backfill (reference project_embeddings,
        db.rs:287-299; we center with the global means everywhere, fixing
        the per-file re-centering drift of db.rs:301-367)."""
        full = self.scan()
        dim = self.dimension()
        model = fit_pca(full, "embedding", min(k, dim))
        projected = full.select(
            "id",
            "content",
            "tags",
            # standalone projection stage (see insert_df: UDF-path models
            # can't project inside quantize's lambdas)
            project_column("embedding", model).alias("_pv"),
            "tag_set_id",
        ).select(
            "id",
            "content",
            "tags",
            quantize("_pv").alias("q"),
            "tag_set_id",
        ).select(
            "id", "content", "tags",
            F.col("q.qmin").alias("qmin"),
            F.col("q.qmax").alias("qmax"),
            # same signed-byte storage shift as insert_df
            F.transform(F.col("q.quant"), lambda b: (b - 128).cast("tinyint")).alias("quant"),
            "tag_set_id",
        )
        tmp = self.data_path + ".projected"
        projected.write.mode("overwrite").partitionBy("tag_set_id").parquet(tmp)
        self.fs.replace(tmp, self.data_path)
        buf = io.BytesIO()
        model.save(buf)
        self.fs.write_bytes_atomic(self.model_path, buf.getvalue())
        # the vector space just changed dimension — PQ codes / IVF cells
        # built on the original space are meaningless now
        self._drop_ann_artifacts()
        return model

    def _drop_ann_artifacts(self) -> None:
        for p in (self.pq_path, self.pq_meta_path, self.ivf_path,
                  self.ivf_meta_path, self.ivfpq_path, self.ivfpq_meta_path):
            self.fs.delete(p)

    def _load_model(self) -> PCAModel | None:
        if self.fs.exists(self.model_path):
            return PCAModel.load(io.BytesIO(self.fs.read_bytes(self.model_path)))
        return None

    # -- small JSON artifacts over self.fs ----------------------------------

    def _read_json(self, p: str) -> dict:
        return json.loads(self.fs.read_bytes(p).decode("utf-8"))

    def _write_json(self, p: str, obj: dict) -> None:
        self.fs.write_bytes_atomic(p, json.dumps(obj).encode("utf-8"))
