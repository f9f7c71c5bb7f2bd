"""Time individual catalog queries: python tools/qtime.py [sf_dir] q1 q2 ...

Runs each query twice (min reported) after a codegen/worker-pool warmup at
sf0.001, mirroring bench.py's measurement discipline without the full suite.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from victor_spark import get_spark  # noqa: E402
from victor_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    names = args or list(QUERIES)

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, d: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].build(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        run(name, "/root/testdata/sf0.001")  # warmup: codegen for this plan
        best = min(run(name, sf_dir) for _ in range(2))
        print(f"{name:26s} {best:.3f}s")


if __name__ == "__main__":
    main()
