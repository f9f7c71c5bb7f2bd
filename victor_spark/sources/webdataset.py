"""WebDataset-style tar-shard ingestion: the standard interchange layout
for large multimodal training corpora (LAION-scale image/text pairs ship
as thousands of .tar shards whose members group into samples by basename:
``00042.jpg`` + ``00042.txt`` + ``00042.json`` is one sample).

Spark-first shape, both directions partition-local:

- read: ``binaryFile`` lists and reads whole shards executor-side (one
  task per shard — tars aren't splittable, exactly like .gz; shard count
  IS the read parallelism, which is why the format standardizes ~shard
  sizes), then one Arrow-batched pass untars in memory and pivots the
  members into one row per sample with a binary column per extension.
- write: one tar per partition, packed executor-side, with a manifest
  row per shard back in the returned DataFrame. Local targets write
  in-place (lazy manifest, no driver I/O); URI-scheme targets
  (``hdfs://``/``s3a://``/``file:``) stage locally and a post-pack
  driver-side pass ships the manifest-listed shards through the fs shim
  (``sources/shipping.py`` — Python workers have no JVM gateway, so the
  driver moves the whole-file shard payloads, one bounded pass). Writes
  scale with partitions either way.

Reference parity note: the reference engine has no archive ingestion;
this is part of the training-data-pipeline extension surface (SURVEY
§2's "multimodal columns" family). Format: the public WebDataset
convention (POSIX tar, members grouped by key = name up to the FIRST
dot, extension = the rest).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from victor_spark.fs import fs_for, join as fsjoin


def _split_member(name: str) -> tuple[str, str]:
    """WebDataset key rule (upstream ``base_plus_ext``): sample key =
    the FULL member path up to the first dot of the basename, extension
    = the rest ('a/0042.seg.png' -> ('a/0042', 'seg.png')). Keeping the
    directory prefix in the key matters: shards with subdirectories
    ('a/0001.jpg' + 'b/0001.txt') are DISTINCT samples, and a
    basename-only key would silently cross-pair them into one row
    (round-6 advisor, medium)."""
    dirname, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    return (f"{dirname}/{stem}" if dirname else stem), ext


def load_webdataset(
    spark: SparkSession, path: str, exts: list[str], glob: str = "*.tar"
) -> DataFrame:
    """Read a directory of WebDataset tar shards into one row per sample:
    ``(key string, <ext> binary ...)`` with a column per requested
    extension (dots become underscores in column names). Members with
    unrequested extensions are ignored; a sample missing a requested
    member gets NULL — filter or quarantine downstream.

    The untar runs inside mapInPandas on whole-shard payloads, so memory
    per task is one shard (the format's sizing contract); nothing is
    ever collected to the driver."""
    fields = [StructField("key", StringType())]
    cols = {e: e.replace(".", "_") for e in exts}
    fields += [StructField(cols[e], BinaryType()) for e in exts]
    schema = StructType(fields)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )

    def _untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # yield PER SHARD, not per Arrow batch: a batch can carry
            # many whole shards, and accumulating them all would make
            # task memory sum-of-shards instead of the documented
            # one-shard bound
            for content in pdf["content"]:
                rows: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = _split_member(m.name)
                        if ext not in cols:
                            continue
                        if key not in rows:
                            rows[key] = {}
                            order.append(key)
                        rows[key][ext] = tf.extractfile(m).read()
                yield pd.DataFrame(
                    {
                        "key": order,
                        **{
                            cols[e]: [rows[k].get(e) for k in order]
                            for e in exts
                        },
                    }
                )

    return raw.mapInPandas(_untar, schema=schema)


MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    content_cols: dict[str, str],
    prefix: str = "shard",
    staging_dir: str | None = None,
) -> DataFrame:
    """Pack a DataFrame into WebDataset tar shards, ONE SHARD PER
    PARTITION, written executor-side. ``content_cols`` maps column ->
    member extension (binary or string columns; strings are utf-8
    encoded). For a plain local ``path`` the returned manifest
    (shard, n_samples, n_bytes) is LAZY — an action on it performs the
    write. For a ``path`` with a URI scheme (``hdfs://``, ``s3a://``,
    ``file:``) the call is EAGER: shards pack to ``staging_dir`` and a
    post-pack DRIVER-SIDE pass ships each one through the fs shim
    (:func:`victor_spark.sources.shipping.ship_shards` — see its
    docstring for the visibility contract: staging must be readable from
    the driver, automatic in local mode; on a multi-node cluster pass a
    shared mount), so tar export works on every target the other
    maintenance paths do. Repartition the input to pick the shard
    count/size; keys should be unique corpus-wide (the standard
    WebDataset contract)."""
    from urllib.parse import urlparse

    if urlparse(path).scheme:
        import tempfile

        from victor_spark.sources.shipping import ship_shards

        staging = staging_dir or tempfile.mkdtemp(prefix="wds_ship_")
        local = write_webdataset(df, staging, key_col, content_cols, prefix)
        return ship_shards(df.sparkSession, local, path, cleanup_dir=staging)
    # backtick-quote so dotted names stay column references, not struct
    # paths, then rename to positional names: pyspark's mapInPandas
    # itself resolves every column via df[col], which re-parses dots as
    # struct access (same advisor family as the itertuples fix below)
    sel = [key_col] + list(content_cols)
    src = df.select(*(f"`{c.replace('`', '``')}`" for c in sel)).toDF(
        *(f"_c{i}" for i in range(len(sel)))
    )
    fs_for(df.sparkSession, path).mkdirs(path)  # driver-side, pre-write

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from victor_spark.fs import LocalFS

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for pdf in batches:
                # positional column access (the _cN names assigned
                # above), NOT itertuples attribute access: pandas
                # renames columns that aren't valid Python identifiers
                # (or start with underscore) to positional _N names,
                # which would raise AttributeError at pack time
                # (round-6 advisor, low)
                cols = [pdf[f"_c{i}"] for i in range(1 + len(content_cols))]
                for vals in zip(*cols):
                    key = str(vals[0])
                    for v, ext in zip(vals[1:], content_cols.values()):
                        if v is None:
                            continue
                        data = (
                            v.encode("utf-8") if isinstance(v, str)
                            else bytes(v)
                        )
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # deterministic shards
                        tf.addfile(info, io.BytesIO(data))
                    n += 1
        if n == 0:
            yield pd.DataFrame({"shard": [], "n_samples": [], "n_bytes": []})
            return
        data = buf.getvalue()
        shard = fsjoin(path, f"{prefix}-{pid:05d}.tar")
        # workers see local paths only (no JVM gateway executor-side);
        # URI-scheme targets never reach this branch — they pack to a
        # local staging dir and ship driver-side (see docstring)
        LocalFS().write_bytes_atomic(shard, data)
        yield pd.DataFrame(
            {"shard": [shard], "n_samples": [n], "n_bytes": [len(data)]}
        )

    return src.mapInPandas(_pack, schema=MANIFEST_SCHEMA)
