"""Capture .explain('formatted') for named queries into plans/<dir>/.

Usage: python tools/capture_plans.py <out_dir> <suffix> q1 q2 ...
e.g.   python tools/capture_plans.py plans/r11 before tpch_q20 bloom_screen
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from victor_spark import get_spark  # noqa: E402
from victor_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].build(spark, "/root/testdata/sf0.1")
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path, len(txt.splitlines()), "lines")


if __name__ == "__main__":
    main()
