"""Deterministic per-query execution metrics: jobs, stages, tasks.

Usage: python tools/qmetrics.py [sf_dir] q1 q2 ...

Runs each query once via the noop sink (after a sf0.001 warmup of the same
plan) and reports the DELTA in completed jobs / stages / tasks from the
Spark status store. Unlike wall time, these are invariant to the sandbox's
scheduling stalls — they measure how much distributed machinery a plan
spins, which is exactly what the optimization round changes (fewer
exchanges -> fewer stages/tasks) and what dominates at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from victor_spark import get_spark  # noqa: E402
from victor_spark.plans import QUERIES  # noqa: E402


def snap(spark):
    store = spark._sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n_jobs = jobs.size()
    n_stages = n_tasks = 0
    it = jobs.iterator()
    while it.hasNext():
        j = it.next()
        n_stages += j.numCompletedStages()
        n_tasks += j.numCompletedTasks()
    return n_jobs, n_stages, n_tasks


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    names = args or list(QUERIES)

    spark = get_spark("qmetrics")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, d: str) -> None:
        QUERIES[name].build(spark, d).write.format("noop").mode("overwrite").save()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"{'query':30s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        run(name, "/root/testdata/sf0.001")  # warmup/codegen for this plan
        j0, s0, t0 = snap(spark)
        run(name, sf_dir)
        j1, s1, t1 = snap(spark)
        print(f"{name:30s} {j1-j0:5d} {s1-s0:7d} {t1-t0:6d}")


if __name__ == "__main__":
    main()
