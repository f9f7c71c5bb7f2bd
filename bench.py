"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time of the headline suite (lower is better). Each query
is fully materialized via the noop sink (count() would let Catalyst prune
the computed columns away); a warmup query absorbs JVM/codegen cold start.
"""

from __future__ import annotations

import json
import os
import sys
import time

from victor_spark import get_spark
from victor_spark.plans import QUERIES

HEADLINE = [
    "topk_cosine",
    "topk_batch",
    "topk_euclidean",
    "ann_lsh_topk",
    "quantize_roundtrip",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "text_stats",
    "doc_fingerprint",
    "tpch_q1",
    "tpch_q3",
    "revenue_by_nation",
    "events_hourly",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("victor_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        df = QUERIES[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    # warmup: run the flagship once to absorb JVM/codegen cold start
    run("topk_cosine")

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        run(name)
        dt = round(time.perf_counter() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
