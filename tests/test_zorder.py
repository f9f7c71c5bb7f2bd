"""Z-order layout: integer-exact Morton math + REAL parquet-footer
data-skipping — the files a z-ordered write produces carry tight
min/max on BOTH interleaved columns, which is the entire point.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from victor_spark.operators.zorder import (
    int_rank,
    morton_key,
    write_zordered,
    zorder_frame,
)
from victor_spark.sources import load_table


def _file_stats(path: str, column: str) -> list[tuple]:
    """(min, max) per parquet data file from footer metadata only."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            s = col.statistics
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011 -> bits at 0,2 ; y=0b101 -> bits at 1,5... interleaved:
    # z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    #   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    row = df.select(morton_key(F.col("x"), F.col("y"), bits=3).alias("z")).collect()
    assert row[0].z == 39


def test_int_rank_hits_both_ends_exactly(spark):
    df = spark.range(101).select(F.col("id").alias("x"))
    r = df.select(
        int_rank(F.col("x"), F.lit(0), F.lit(100), bits=8).alias("r")
    ).agg(F.min("r"), F.max("r")).collect()[0]
    assert (r[0], r[1]) == (0, 255)


def test_constant_column_ranks_zero(spark):
    df = spark.range(5).select(F.lit(7).alias("x"))
    r = df.select(int_rank(F.col("x"), F.lit(7), F.lit(7)).alias("r")).collect()
    assert all(row.r == 0 for row in r)


def test_zorder_frame_key_is_partition_independent(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    a = {r.event_id: r._zkey for r in zorder_frame(ev, "user_id", "value").collect()}
    b = {
        r.event_id: r._zkey
        for r in zorder_frame(ev.repartition(13), "user_id", "value").collect()
    }
    assert a == b


def test_zordered_files_prune_on_both_columns(spark, tmp_path):
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", (F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("cents"))
    )
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(ev, zdir, "user_id", "cents", n_files=8)
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id").write.parquet(
        xdir
    )

    lo_u, hi_u, lo_c, hi_c = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("cents"), F.max("cents")
    ).collect()[0]
    dom_u, dom_c = hi_u - lo_u, hi_c - lo_c

    def mean_span(stats, dom):
        return sum((b - a) / dom for a, b in stats) / len(stats)

    # x-sorted layout: near-zero user_id spans, near-full cents spans
    assert mean_span(_file_stats(xdir, "user_id"), dom_u) < 0.30
    assert mean_span(_file_stats(xdir, "cents"), dom_c) > 0.60
    # z-ordered layout: BOTH columns materially below full domain
    zu = mean_span(_file_stats(zdir, "user_id"), dom_u)
    zc = mean_span(_file_stats(zdir, "cents"), dom_c)
    assert zu < 0.60 and zc < 0.60

    # pruning simulation: a predicate on cents alone skips z-order files
    # but no x-sorted file
    probe_lo, probe_hi = lo_c, lo_c + dom_c // 10
    x_hit = sum(1 for a, b in _file_stats(xdir, "cents") if a <= probe_hi and b >= probe_lo)
    z_hit = sum(1 for a, b in _file_stats(zdir, "cents") if a <= probe_hi and b >= probe_lo)
    assert x_hit == 8  # single-column sort cannot skip on the other column
    assert z_hit < 8  # z-order can


def test_zorder_write_roundtrips_rows(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "zz")
    write_zordered(ev, out, "user_id", "event_id", n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert set(back.columns) == {"event_id", "user_id", "value"}
    assert back.select(F.sum("event_id")).collect() == ev.select(
        F.sum("event_id")
    ).collect()

def test_zorder_sql_fast_paths_match_builders(spark):
    """Round-11: column NAMES route int_rank/morton_key through one parsed
    SQL string; the expression must be bit-identical to the builder form
    (incl. the span==0 rank, negative domains, and the 2^31 bit literal)."""
    rows = [
        (0, 0, 0, 100, -50, 50),
        (100, 37, 0, 100, -50, 50),
        (-50, 50, -50, 50, -50, 50),
        (7, 7, 7, 7, 7, 7),  # span == 0 on x
        (123456, 65535, 0, 200000, 0, 65535),
    ]
    df = spark.createDataFrame(
        rows, "x long, y long, xmin long, xmax long, ymin long, ymax long"
    )
    both = df.select(
        int_rank("x", "xmin", "xmax").alias("rs"),
        int_rank(F.col("x"), F.col("xmin"), F.col("xmax")).alias("rb"),
        morton_key("x", "y").alias("ms"),
        morton_key(F.col("x"), F.col("y")).alias("mb"),
        morton_key("x", "y", bits=16).alias("ms16"),
    ).collect()
    for r in both:
        assert r.rs == r.rb
        assert r.ms == r.mb
        assert r.ms16 == r.ms


def test_morton_key_mixed_str_column_args(spark):
    """Round-12 advice fix: a mixed (str, Column) call must resolve the
    string as a COLUMN, not a string literal (which yielded NULL keys or
    an ANSI cast failure), and equal the all-Column builder result."""
    df = spark.range(64).select(
        (F.col("id") % 7).alias("xs"), (F.col("id") % 5).alias("ys")
    )
    ref = df.select(morton_key(F.col("xs"), F.col("ys"), 4).alias("k")).collect()
    for a, b in ((F.col("xs"), "ys"), ("xs", F.col("ys"))):
        got = df.select(morton_key(a, b, 4).alias("k")).collect()
        assert got == ref


def test_zorder_fast_path_guard_rejects_odd_names(spark):
    """Dotted names must fall back to the builder, where F.col resolves
    them as struct-field access — not be backticked into the SQL fast
    path as a single literal identifier (unresolvable)."""
    df = spark.range(8).select(
        F.struct(
            (F.col("id") % 3).alias("x"), (F.col("id") % 2).alias("y")
        ).alias("s")
    )
    ref = df.select(
        morton_key(F.col("s.x"), F.col("s.y"), 4).alias("k"),
        int_rank(F.col("s.x"), F.lit(0), F.lit(2), 4).alias("r"),
    ).collect()
    got = df.select(
        morton_key("s.x", "s.y", 4).alias("k"),
        int_rank(F.col("s.x"), F.lit(0), F.lit(2), 4).alias("r"),
    ).collect()
    assert got == ref
