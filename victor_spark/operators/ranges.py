"""Range join (point-in-interval) via the bin-bucketing rewrite.

An extension operator — the reference has no joins at all (its only lookup
is the per-candidate content probe, /root/reference/src/db.rs:590-605) —
but any event/telemetry pipeline needs "match each point to the intervals
containing it", and the naive Spark formulation

    points.join(intervals, (p >= start) & (p < end))

has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin (fine only
when one side is tiny) or, worse, a cartesian product: O(n*m) comparisons
that no cluster survives at 100 TB.

The standard rewrite (the same one behind Databricks' range-join bin
optimization and PostGIS grid joins): quantize the point axis into
fixed-width bins. Each point lives in exactly ONE bin; each interval is
exploded to the bins it covers (ceil(len/width)+1 rows — bounded, because
the caller picks ``bin_width`` on the order of the interval length). The
join becomes an equi-join on the bin id plus a cheap residual containment
filter, i.e. a plain shuffle-hash/sort-merge join that AQE can re-plan and
skew-split like any other. Cost: interval-side duplication by a small
constant; no row explosion on the point side, and each matching
(point, interval) pair is produced exactly once (the pair can only meet in
the point's single bin), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join ``points`` to the ``intervals`` rows whose half-open
    range ``[start_col, end_col)`` contains ``point_col``.

    Returns all columns of both inputs (pre-alias on collision). The three
    range columns must be mutually comparable numerics (cast timestamps to
    epoch first); ``bin_width`` should be about the typical interval
    length — shorter wastes interval duplication, longer wastes residual
    filtering. Empty/inverted intervals (end <= start) match nothing.

    Bins are ``floor(x / bin_width)`` computed in double precision — both
    engines of the correctness gate evaluate the identical IEEE expression.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))
    p = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    i = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
                )
            ),
        )
    )
    return (
        p.join(i, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )
