"""Z-order (Morton) clustering: multi-column data-skipping layout.

The 100 TB problem this solves: parquet skips row groups by min/max
footer stats, but a table sorted by ONE column has full-domain spans on
every OTHER column — predicates on those columns prune nothing.
Interleaving the bits of two (or more) bounded column ranks gives a
1-D sort key whose contiguous ranges are small HYPER-RECTANGLES in the
multi-column space: range-partition + sort by the Morton key and every
file carries tight min/max on ALL interleaved columns, so Spark's scan
pruning works for predicates on any of them (the OPTIMIZE ZORDER BY of
Delta/Iceberg, built here from plain column expressions).

Determinism contract: ranks and the interleave are INTEGER arithmetic
end-to-end (`((x - xmin) * (2^bits - 1)) div (xmax - xmin)`, then
div/mod bit extraction) — no float scaling, so the key is reproducible
across engines and a DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victor_spark.functions.text import _is_simple_name


def int_rank(x: Column | str, xmin: Column | str, xmax: Column | str,
             bits: int = 16) -> Column:
    """Scale an integer column into [0, 2^bits) — exact integer math.

    ``(x - xmin) * (2^bits - 1) div (xmax - xmin)``; a constant column
    (xmin == xmax) ranks to 0.

    The quotient is computed as floor over double division, which is
    exact while ``(xmax - xmin) * 2^bits < 2^53`` — holds for any
    bits=16 column with span < ~1.4e11 (every column here); pre-bucket
    wider domains (e.g. epoch-micros timestamps → minutes) first.

    Column NAMES take a one-parsed-SQL-string fast path (round-11,
    guide §7.3 — the hashing-kernel precedent): identical expression,
    pinned by ``tests/test_zorder.py``'s differential test; Column
    inputs keep the builder path.
    """
    if _is_simple_name(x) and _is_simple_name(xmin) and _is_simple_name(xmax):
        # simple identifiers only — dotted/odd names fall through to the
        # builder, where F.col resolves them (same guard as quality_score)
        top = (1 << bits) - 1
        span = f"CAST((`{xmax}` - `{xmin}`) AS BIGINT)"
        return F.expr(
            f"CASE WHEN {span} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(FLOOR((CAST(`{x}` AS BIGINT) - CAST(`{xmin}` AS BIGINT))"
            f" * {top} / {span}) AS BIGINT) END"
        )
    x, xmin, xmax = F.col(x) if isinstance(x, str) else x, \
        F.col(xmin) if isinstance(xmin, str) else xmin, \
        F.col(xmax) if isinstance(xmax, str) else xmax
    top = F.lit((1 << bits) - 1)
    span = (xmax - xmin).cast("long")
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(
        F.floor((x.cast("long") - xmin.cast("long")) * top / span).cast("long")
    )


def morton_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Bit-interleave two ranks in [0, 2^bits) into one 2·bits-bit key.

    Bit i of x lands at position 2i, bit i of y at 2i+1 — one codegen
    expression of 2·bits div/mod terms, no UDF.

    Column NAMES take the one-parsed-SQL fast path (the int_rank note);
    the builder form costs ~2·bits·6 py4j round trips per call.
    """
    if _is_simple_name(x) and _is_simple_name(y):
        terms = []
        for i in range(bits):
            terms.append(
                f"(CAST(FLOOR((`{x}` / {1 << i})) AS BIGINT) % 2) * {1 << (2 * i)}"
                f" + (CAST(FLOOR((`{y}` / {1 << i})) AS BIGINT) % 2)"
                f" * {1 << (2 * i + 1)}"
            )
        return F.expr("(" + ") + (".join(terms) + ")")
    # mixed str/Column args land here: coerce names via F.col BEFORE the
    # builder loop — a bare str would otherwise reach Column.__rtruediv__
    # and be treated as a STRING LITERAL (silent NULL keys / ANSI cast
    # failure), the round-11 advice item
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        xbit = (F.floor(x / F.lit(1 << i)).cast("long") % 2) * F.lit(1 << (2 * i))
        ybit = (F.floor(y / F.lit(1 << i)).cast("long") % 2) * F.lit(1 << (2 * i + 1))
        terms.append(xbit + ybit)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_frame(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16, key_col: str = "_zkey"
) -> DataFrame:
    """Attach the Morton key over the two columns' observed ranges.

    The min/max bounds ride along as a broadcast 1-row aggregate (no
    driver collect); at 100 TB the bounds job is a column-pruned scan.
    """
    b = F.broadcast(
        df.agg(
            F.min(x_col).alias("_xmin"),
            F.max(x_col).alias("_xmax"),
            F.min(y_col).alias("_ymin"),
            F.max(y_col).alias("_ymax"),
        )
    )
    out = df.crossJoin(b)
    xs = int_rank(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits)
    ys = int_rank(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits)
    return out.withColumn(key_col, morton_key(xs, ys, bits)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Range-partition + sort by the Morton key and write parquet.

    Every output file covers a contiguous Morton range = a tight
    hyper-rectangle in (x, y), so its footer min/max prune scans for
    predicates on EITHER column. The key column itself is dropped —
    the layout, not the schema, carries the clustering.
    """
    keyed = zorder_frame(df, x_col, y_col, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
