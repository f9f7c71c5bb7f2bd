"""As-of join: match each left row to the most recent right row at or
before its timestamp, per join key (pandas ``merge_asof`` backward
semantics; an extension operator — the reference has no relational joins
at all, /root/reference/src/db.rs:590-605 is its only lookup).

Spark has no native as-of join, and the naive formulations fall over at
scale: a range-condition join plans as a broadcast-nested-loop or sort
-merge over an exploded inequality, and a per-key ``applyInPandas`` ships
every row through Python. Instead this uses the union trick:

    union both sides → one window partitioned by key, ordered by
    (ts, side) → ``last(right_col, ignorenulls=True)`` carries the most
    recent right payload forward onto each left row → filter left side.

Cost: exactly ONE shuffle (on the join keys, shared by every carried
column since they use the same window), no row explosion, whole-stage
codegen throughout, and AQE handles key skew. At 100 TB this is the same
shuffle any per-key window needs — the minimum for the semantics.

Ties: right rows sort before left rows at equal timestamps, so a right
row at exactly the left timestamp IS matched (allow_exact_matches=True,
DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

Row atomicity: the matched right row's payload travels as ONE struct
through a single ``last(ignorenulls=True)``, so the output columns always
come from the *same* right row even when some payload columns are
legitimately NULL (a per-column carry would mix rows: a NULL payload field
would fall back to an older right row's value, diverging from
``merge_asof``). Right rows tying on (key, ts) are broken by the payload
struct itself (lexicographic, ascending — the max struct wins), making the
operator deterministic run-to-run; payload columns must therefore be of
orderable types (no maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload columns of the
    latest ``right`` row with the same ``on`` keys and ``right_ts`` <=
    ``left_ts`` (nulls if no such row). Right payload columns (including
    ``right_ts``) come back renamed with ``suffix``."""
    rcols = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.struct(*[F.col(c).alias(c + suffix) for c in rcols]).alias("__asof_row"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__asof_ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__side", "__asof_row")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__asof_row", F.last("__asof_row", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(
        *left.columns, *[F.col("__asof_row")[c + suffix].alias(c + suffix) for c in rcols]
    )
