"""Post-pack shard shipping: move executor-packed archive shards to any
filesystem the fs shim serves.

The tar/WARC packers write shards executor-side with plain ``LocalFS``
(Python workers have no JVM gateway, so they cannot reach ``hdfs://`` /
``s3a://`` directly). The ship step is then one DRIVER-side pass moving
the manifest-listed artifacts through :func:`victor_spark.fs.fs_for` —
whole-file payloads sized by the formats' own ~shard conventions,
exactly what the shim's byte API is for. The manifest is one row per
shard (bounded by partition count), so collecting it is a model-sized
collect, not a data collect.

VISIBILITY CONTRACT: the driver must be able to READ the staging paths
the executors wrote. That holds automatically in local mode (driver ==
executors — this sandbox and the common single-node export case); on a
multi-node cluster it requires the packers' ``staging_dir`` to be a
shared mount (NFS/Lustre/fuse). Without shared staging, executor-local
shards are unreachable from the driver — pack to a plain local path per
node and merge with distcp instead. This is stated, not hidden: the
writers' docstrings point here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from victor_spark.fs import LocalFS, fs_for
from victor_spark.fs import join as fsjoin


def ship_shards(
    spark: SparkSession,
    manifest: DataFrame,
    dest: str,
    cleanup_dir: str | None = None,
) -> DataFrame:
    """Execute a lazy pack manifest and move every shard it lists to
    ``dest`` (any scheme :func:`fs_for` serves, including ``file:`` —
    how the tests exercise the Hadoop code path). Returns the shipped
    manifest with final shard paths, same schema as the input. The
    collect is bounded: one row per shard. ``cleanup_dir`` (the local
    staging root) is removed afterwards."""
    rows = manifest.collect()  # triggers the executor-side pack
    local = LocalFS()
    out_fs = fs_for(spark, dest)
    out_fs.mkdirs(dest)
    shipped = []
    try:
        for r in rows:
            d = r.asDict()
            final = fsjoin(dest, os.path.basename(d["shard"]))
            out_fs.write_bytes_atomic(final, local.read_bytes(d["shard"]))
            local.delete(d["shard"])
            d["shard"] = final
            shipped.append(
                tuple(d[f.name] for f in manifest.schema.fields)
            )
    finally:
        if cleanup_dir is not None:
            shutil.rmtree(cleanup_dir, ignore_errors=True)
    return spark.createDataFrame(shipped, schema=manifest.schema)
