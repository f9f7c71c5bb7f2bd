"""fan_out guard hardening (round-12, verdict item 6 + advice items).

The guard must (a) widen narrow scans, (b) no-op on inputs a caller
already widened, (c) no-op on a genuinely WIDE input even when a Filter's
selectivity estimate under-reports its size (at 100 TB a misfired
round-robin repartition is a full shuffle), and (d) still widen a
deliberately coalesced-narrow input (coalesce is Repartition
shuffle=false and must NOT be mistaken for a prior widening).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.sources import load_table
from victor_spark.sources.tables import fan_out

from tests.conftest import SF_SMOKE


def _has_shuffle_repartition(df) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(
        line.lstrip(" :+-").startswith("Repartition")
        and line.rstrip().endswith("true")
        or line.lstrip(" :+-").startswith("RepartitionByExpression")
        for line in plan.splitlines()
    )


def test_narrow_scan_is_widened(spark):
    t = load_table(spark, SF_SMOKE, "documents")
    out = fan_out(t)
    assert _has_shuffle_repartition(out)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_already_fanned_input_is_noop(spark):
    t = load_table(spark, SF_SMOKE, "documents")
    once = fan_out(t)
    again = fan_out(once)
    assert again is once, "second fan_out must not add another exchange"


def test_coalesced_narrow_input_is_still_widened(spark):
    # advice item: coalesce() renders as Repartition shuffle=false and must
    # not suppress the widening the old partition-count probe performed
    t = load_table(spark, SF_SMOKE, "documents").coalesce(1)
    out = fan_out(t)
    assert _has_shuffle_repartition(out)


def test_filtered_wide_input_is_noop(spark):
    # verdict item 6: analyzed-plan sizeInBytes applies filter selectivity,
    # so a filtered WIDE input can be under-estimated below the byte
    # threshold. The guard must fall back to the physical partition probe
    # for non-scan/project/union shapes and no-op when the input is
    # already wide. Simulate "wide" with min_partitions=1: any input with
    # >= 1 partition is wide relative to the target, so a correct guard
    # no-ops; the broken one trusts the estimate and repartitions.
    t = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") > 3)
    out = fan_out(t, min_partitions=1)
    assert out is t, "filtered input must use the partition probe, not stats"


def test_filtered_narrow_input_is_widened(spark):
    # the probe fallback still widens a genuinely narrow filtered input
    t = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") > 3)
    out = fan_out(t)
    assert _has_shuffle_repartition(out)


def test_schema_memo_detects_in_place_rewrite(spark, tmp_path):
    """Advice item: a parquet directory rewritten in place (same dir name)
    must MISS the schema memo; per-path keying also evicts the old entry."""
    d = str(tmp_path)
    p = d + "/documents.parquet"
    spark.range(5).write.mode("overwrite").parquet(p)
    first = load_table(spark, d, "documents")
    assert first.columns == ["id"]
    import time

    time.sleep(0.02)  # ensure distinct mtime_ns granularity
    spark.range(5).selectExpr("id", "id AS extra").write.mode(
        "overwrite"
    ).parquet(p)
    second = load_table(spark, d, "documents")
    assert "extra" in second.columns
    cache = spark._victor_schema_cache
    assert sum(1 for k in cache if k == p) <= 1, "stale entries accumulate"
