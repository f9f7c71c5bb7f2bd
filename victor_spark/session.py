"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same settings are what we would ship on a real cluster: AQE on (runtime
coalescing + skew-join handling), Arrow for the few pandas-UDF paths, and a
shuffle-partition count sized for the local box (on a 1000-executor cluster
this would be raised to ~2-3x total cores, or left to AQE's coalescing with a
high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "victor_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    AQE is enabled so that at real scale the engine re-plans shuffles at
    runtime (coalesce small partitions, split skewed ones, demote/promote
    joins to broadcast). ``spark.sql.shuffle.partitions`` is the *initial*
    partition count; AQE coalesces downward.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
