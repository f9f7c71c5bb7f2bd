"""Bloom-filtered join: the runtime-filter / star-join pre-prune as an
explicit operator.

The scale problem: `fact ⋈ dim` with a selective dim shuffles the whole
fact table just to discard most of it at the join. Engines solve this
with runtime bloom filters; this operator is that technique stated in
plain column expressions so the plan is inspectable and the pruning is
guaranteed, not cost-based: the small side's join keys pack into a
Bloom filter (`operators/sketches.py`, m bits as m/32 longs — one
broadcast row), and the big side drops non-matching rows MAP-SIDE,
before its exchange, so the shuffle moves (matches + fp·non-matches)
rows instead of the whole table.

No false negatives → the result is IDENTICAL to the plain join (Bloom
false positives merely ride the shuffle and fall out of the equi-join).
Restricted to inner/left-semi, the shapes where dropping non-matching
big-side rows early is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victor_spark.operators.sketches import bloom_build, bloom_might_contain


def bloom_filtered_join(big: DataFrame, small: DataFrame, on: str,
                        how: str = "inner", m: int = 1 << 20,
                        k: int = 4) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with a map-side Bloom
    pre-filter of the big side. Size ``m`` (bits; default 2^20 ≈ 128 KB
    broadcast) for the small side's distinct key count."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom_filtered_join supports inner/semi, got {how!r}")
    # the filter payload rides under a reserved alias so a big-side column
    # named "words" is neither shadowed in the probe nor dropped below
    if "__bloom_words" in big.columns:
        raise ValueError("big side may not contain a __bloom_words column")
    bits = bloom_build(small.select(F.col(on)), on, k=k, m=m, salt="bj").select(
        F.col("words").alias("__bloom_words")
    )
    pruned = (
        big.crossJoin(F.broadcast(bits))
        .filter(
            bloom_might_contain(
                F.col("__bloom_words"), F.col(on), k=k, m=m, salt="bj"
            )
        )
        .drop("__bloom_words")
    )
    spark_how = "left_semi" if how in ("semi", "left_semi", "leftsemi") else "inner"
    return pruned.join(small, on, spark_how)
