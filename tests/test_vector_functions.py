"""Kernel unit tests mirroring the reference's closed-form cases
(/root/reference/src/similarity.rs:45-85, packed_vector.rs:66-169)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from victor_spark.functions.vector import (
    cosine,
    dequantize,
    dot,
    euclidean,
    norm,
    quantize,
)


def _one(spark, a, b):
    return spark.createDataFrame(
        [([float(x) for x in a], [float(x) for x in b])], "a array<double>, b array<double>"
    )


def test_cosine_basic(spark):
    # similarity.rs:45-57 — [1,2,3]·[3,2,1] → 0.7142857
    r = _one(spark, [1, 2, 3], [3, 2, 1]).select(cosine("a", "b").alias("c")).first()
    assert abs(r["c"] - 0.7142857) < 0.001


def test_cosine_identical(spark):
    r = _one(spark, [1, 2, 3], [1, 2, 3]).select(cosine("a", "b").alias("c")).first()
    assert abs(r["c"] - 1.0) < 0.001


def test_cosine_opposite(spark):
    r = _one(spark, [1, 2, 3], [-1, -2, -3]).select(cosine("a", "b").alias("c")).first()
    assert abs(r["c"] + 1.0) < 0.001


def test_dot_and_norm(spark):
    r = _one(spark, [1, 2, 3], [3, 2, 1]).select(
        dot("a", "b").alias("d"), norm("a").alias("n")
    ).first()
    assert r["d"] == 10.0
    assert abs(r["n"] - math.sqrt(14)) < 1e-12


def test_euclidean(spark):
    # similarity.rs:26-43
    r = _one(spark, [0, 0, 0], [3, 4, 0]).select(euclidean("a", "b").alias("e")).first()
    assert abs(r["e"] - 5.0) < 1e-12


@pytest.mark.parametrize(
    "vec",
    [
        [0.0] * 64,                      # zeros — packed_vector.rs:80-87
        [1.0] * 64,                      # constant (min==max guard)
        [float(i % 2) for i in range(64)],  # alternating 0/1 — :96-103
    ],
)
def test_quantize_lossless_degenerate(spark, vec):
    df = spark.createDataFrame([(vec,)], "v array<double>")
    r = (
        df.withColumn("q", quantize("v"))
        .withColumn("back", dequantize("q.quant", "q.qmin", "q.qmax"))
        .select(
            F.array_max(F.zip_with("v", "back", lambda a, b: F.abs(a - b))).alias("err")
        )
        .first()
    )
    assert r["err"] == 0.0


def test_quantize_error_bound_random_unit(spark):
    # packed_vector.rs:105-149: seeded uniform(-1000,1000) normalized, d=1024
    import random

    rng = random.Random(0)
    v = [rng.uniform(-1000, 1000) for _ in range(1024)]
    n = math.sqrt(sum(x * x for x in v))
    v = [x / n for x in v]
    df = spark.createDataFrame([(v,)], "v array<double>")
    r = (
        df.withColumn("q", quantize("v"))
        .withColumn("back", dequantize("q.quant", "q.qmin", "q.qmax"))
        .select(
            F.array_max(F.zip_with("v", "back", lambda a, b: F.abs(a - b))).alias("mx"),
            (
                F.aggregate(
                    F.zip_with("v", "back", lambda a, b: F.abs(a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size("v")
            ).alias("avg"),
        )
        .first()
    )
    # reference bounds: max < 0.0005, avg < 0.0002 (packed_vector.rs:142-143)
    assert r["mx"] < 0.0005
    assert r["avg"] < 0.0002


def test_quantize_idempotent(spark):
    # packed_vector.rs:146-148 — re-packing an unpacked vector is lossless
    import random

    rng = random.Random(1)
    v = [rng.uniform(-1, 1) for _ in range(128)]
    df = spark.createDataFrame([(v,)], "v array<double>")
    once = (
        df.withColumn("q", quantize("v"))
        .select(dequantize("q.quant", "q.qmin", "q.qmax").alias("v1"))
    )
    r = (
        once.withColumn("q", quantize("v1"))
        .select(
            F.array_max(
                F.zip_with(
                    "v1",
                    dequantize("q.quant", "q.qmin", "q.qmax"),
                    lambda a, b: F.abs(a - b),
                )
            ).alias("err")
        )
        .first()
    )
    assert r["err"] < 1e-9


def test_pandas_cosine_matches_native_kernel(spark):
    """The Arrow/numpy cosine and the native fold agree to float tolerance
    on real vectors (exact hash parity is the native kernel's job)."""
    from victor_spark.functions.vector import (
        cosine_to_literal,
        cosine_to_literal_pandas,
        to_double_array,
    )
    from victor_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    ).limit(50)
    q = [float(x) for x in e.first()["v"]]
    both = e.select(
        cosine_to_literal("v", q).alias("native"),
        cosine_to_literal_pandas("v", q).alias("arrow"),
    ).collect()
    assert len(both) == 50
    for r in both:
        assert abs(r["native"] - r["arrow"]) < 1e-12


def test_l2_normalize_matches_cosine_contract(spark):
    import math

    from pyspark.sql import functions as F

    from victor_spark.functions.vector import cosine, dot, l2_normalize

    df = spark.createDataFrame(
        [([3.0, 4.0], [1.0, 0.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        l2_normalize("a").alias("na"),
        dot(l2_normalize("a"), l2_normalize("b")).alias("nd"),
        cosine("a", "b").alias("c"),
    ).collect()
    # normalized dot tracks cosine to float tolerance on real vectors
    assert rows[0]["na"] == [0.6, 0.8]
    assert abs(rows[0]["nd"] - rows[0]["c"]) < 1e-12
    # zero-norm: NaN components (cosine's contract), never a job error
    assert all(math.isnan(x) for x in rows[1]["na"])
    assert math.isnan(rows[1]["nd"]) and math.isnan(rows[1]["c"])


def test_lit_doubles_bit_exact_vs_per_element_lits(spark):
    """The round-11 one-expr literal builders must parse to the SAME
    doubles as per-element F.lit — bit-for-bit, including subnormals, max
    double, -0.0, NaN/Inf and random 64-bit patterns (repr round-trips
    shortest-exact; the parser's Double.parseDouble is correctly
    rounded)."""
    import random
    import struct

    from pyspark.sql import functions as F

    from victor_spark.functions.vector import lit_doubles, lit_doubles_2d

    rng = random.Random(7)
    vals = [
        5e-324, 1.7976931348623157e308, -0.0, 0.1 + 0.2, 1 / 3, -1e-300,
        float("nan"), float("inf"), float("-inf"),
    ] + [
        struct.unpack("d", struct.pack("<Q", rng.getrandbits(64)))[0]
        for _ in range(100)
    ]
    df = spark.range(1)
    got = df.select(lit_doubles(vals).alias("a")).collect()[0]["a"]
    ref = df.select(
        F.array(*[F.lit(float(x)) for x in vals]).alias("a")
    ).collect()[0]["a"]
    assert [struct.pack("d", x) for x in got] == [
        struct.pack("d", x) for x in ref
    ]
    # nested form + empty forms keep the declared types
    got2 = df.select(lit_doubles_2d([vals[:5], vals[5:9]]).alias("a")).collect()[0]["a"]
    assert [struct.pack("d", x) for r in got2 for x in r] == [
        struct.pack("d", x) for x in vals[:9]
    ]
    assert (
        df.select(lit_doubles([]).alias("a")).schema["a"].dataType.simpleString()
        == "array<double>"
    )
    assert (
        df.select(lit_doubles_2d([]).alias("a")).schema["a"].dataType.simpleString()
        == "array<array<double>>"
    )
