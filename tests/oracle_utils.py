"""Spark-vs-DuckDB comparison used by the parity tests — mirrors the
driver's t2 gate: row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from victor_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sdf = _canon(spark_df.toPandas())
    odf = _canon(oracle_df)
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if list(sdf.columns) != list(odf.columns):
        problems.append(f"columns: spark={list(sdf.columns)} oracle={list(odf.columns)}")
        return problems
    if problems:
        return problems
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        for i, (x, y) in enumerate(zip(a, b)):
            same = (
                (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float)
                    and (x == y or (math.isnan(x) and math.isnan(y))))
                or x == y
            )
            if not same:
                problems.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                if len(problems) > 5:
                    return problems
    return problems
