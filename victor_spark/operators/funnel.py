"""Ordered-funnel analysis over an event stream (extension operator — the
reference has no event/relational queries at all; this is the classic
product-analytics operator every events engine ships).

Semantics (strict ordering): a user reaches step k at the EARLIEST event of
type steps[k] that is strictly later than their step k-1 time. Re-orderings
don't count — a purchase before the first view is not a funnel purchase.

Spark shape: ONE shuffle (groupBy user) collecting each user's (ts, type)
pairs, then a per-user linear fold over the time-sorted array with
``aggregate`` — no self-joins, no windows, no per-step passes. The state
struct carries one timestamp per step; the fold is whole-row-atomic, so the
operator is deterministic for any partitioning. At 100 TB the shuffle
carries only (user, ts, type) triples and per-user arrays are session-
sized; a pathological single user with millions of events would need a
two-level pre-aggregation (keep earliest candidate per type per partition),
which the strict-order semantics permits but the testdata never needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victor_spark.functions.vector import bind


def funnel_times(events: DataFrame, user_col: str, ts_col: str,
                 type_col: str, steps: list[str]) -> DataFrame:
    """Per-user funnel: one row per user with ``t1..tn`` (epoch-micro step
    times, null when the step was never reached in order) and ``stage`` =
    number of steps completed."""
    n = len(steps)
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_tus"),
        F.col(type_col).alias("_ty"),
    )
    zero = F.struct(
        *[F.lit(None).cast("long").alias(f"t{i + 1}") for i in range(n)]
    )

    def _advance(acc: Column, e: Column) -> Column:
        fields = []
        for i in range(n):
            prev_done = F.lit(True) if i == 0 else acc[f"t{i}"].isNotNull()
            prev_t = F.lit(-1).cast("long") if i == 0 else acc[f"t{i}"]
            take = (
                acc[f"t{i + 1}"].isNull()
                & prev_done
                & (e["ty"] == steps[i])
                & (e["tus"] > prev_t)
            )
            fields.append(
                F.when(take, e["tus"]).otherwise(acc[f"t{i + 1}"]).alias(f"t{i + 1}")
            )
        return F.struct(*fields)

    def _fold(seq: Column) -> Column:
        return F.aggregate(seq, zero, _advance)

    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_tus").alias("tus"), F.col("_ty").alias("ty")))
        ).alias("_seq")
    )
    folded = per_user.select("user_id", bind(F.col("_seq"), _fold).alias("_f"))
    stage = F.lit(0)
    for i in range(n):
        stage = F.when(F.col("_f")[f"t{i + 1}"].isNotNull(), i + 1).otherwise(stage)
    return folded.select(
        "user_id",
        *[F.col("_f")[f"t{i + 1}"].alias(f"t{i + 1}") for i in range(n)],
        stage.cast("int").alias("stage"),
    )
