"""Simulate the driver's correctness gate with a VANILLA SparkSession.

The driver builds its own SparkSession (no victor_spark confs) and runs
every ``queries()`` entry against its ``oracle_sql()`` twin on DuckDB at
sf0.01. Round 1 lost all five events_* queries to a session-dependent
parquet conf; this script exists so that never happens again — run it
before every round-end commit.

Usage: python tools/driver_sim.py [--pending] [sf_dir] [query ...]

``--pending`` overlays the staged-query modules: catalog_r9's,
catalog_r10's and catalog_r11's specs are already registered
(idempotent overlay), but catalog_r12's are NOT — the flag is the
round-12 staged family's ONLY vanilla-session check until their
registration, so keep using it before round-end commits.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--pending"]
    pending = "--pending" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    # dynamic oracles (bpe_train/bpe_encode/pca_project) resolve against
    # this env var inside __spark_entry__.oracle_sql(); without it they
    # replay sf0.01 data while the queries run on sf_dir — every dynamic
    # oracle then "mismatches" on any non-default directory
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    # intentionally bare: mirrors the driver, not victor_spark.get_spark
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if pending:
        from victor_spark.plans.catalog_r9 import PENDING as _P9
        from victor_spark.plans.catalog_r10 import PENDING as _P10
        from victor_spark.plans.catalog_r11 import PENDING as _P11

        staged = {**_P9, **_P10, **_P11}
        try:
            from victor_spark.plans.catalog_r12 import PENDING as _P12

            staged.update(_P12)
        except ImportError:
            pass
        for name, spec in staged.items():
            queries[name] = spec.build
            sql = spec.oracle_sql(sf_dir)
            if sql is not None:
                oracles[name] = sql

    from tests.oracle_utils import compare, duck_connect

    duck = duck_connect(sf_dir)

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                odf = duck.execute(oracles[name]).fetchdf()
                problems = compare(sdf, odf)
                status = "ok" if not problems else f"MISMATCH {problems[:3]}"
            else:
                n = sdf.count()
                status = f"rows_only ok ({n} rows)"
                problems = []
        except Exception as exc:  # noqa: BLE001
            problems = [str(exc).splitlines()[0]]
            status = f"ERROR {problems[0][:120]}"
        if problems:
            failures.append(name)
        print(f"{name:28s} {status}")

    # the smoke check: entry() in the same vanilla session
    try:
        df = entry.entry(spark)
        n = df.count()
        print(f"{'<entry>':28s} ok ({n} rows)")
    except Exception as exc:  # noqa: BLE001
        failures.append("<entry>")
        print(f"{'<entry>':28s} ERROR {str(exc).splitlines()[0][:120]}")

    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
