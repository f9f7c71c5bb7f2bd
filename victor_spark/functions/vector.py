"""Vector kernels as native Column expressions.

Parity with the reference's similarity kernels (cosine
/root/reference/src/similarity.rs:1-24, euclidean :26-43) and its 8-bit
scalar quantizer (/root/reference/src/packed_vector.rs:11-35), re-expressed
as pyspark.sql.functions higher-order expressions so every kernel runs
JVM-side inside whole-stage codegen — no Python in the hot path, which is
what keeps a 100 TB scan compute-bound rather than serialization-bound.

All arithmetic is done in double precision (the reference uses f32; we cast
up so results are stable and match the DuckDB oracle bit-for-bit in the
common case).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _is_simple_name(s) -> bool:
    """True for a plain column identifier a SQL fast path may backtick
    (dots/odd chars fall back to the builder, where F.col resolves them).
    Canonical home of the guard shared by every one-parsed-SQL fast path
    (text/zorder re-export it)."""
    return isinstance(s, str) and s.replace("_", "").isalnum()


def bind(col: ColumnOrName, fn) -> Column:
    """Evaluate ``col`` once per row and hand it to ``fn`` as a lambda
    variable, returning ``fn``'s result.

    Column expressions compose by TREE EMBEDDING: ``F.size(t) + F.size(t)``
    duplicates t's whole subtree, and inside higher-order-function lambdas
    each duplicate is re-evaluated per ELEMENT (HOF lambdas run interpreted,
    outside codegen) — which turns token/shingle pipelines O(n²) in the
    document length (measured 40× on the word-8-gram explode at sf0.1).
    Wrapping the value in a one-element array and projecting through
    ``transform`` binds it to a NamedLambdaVariable: every reference inside
    ``fn`` is then an O(1) slot read and the subtree runs exactly once per
    row, in every context the expression lands in (including optimizer-
    inferred copies such as explode's non-empty pre-filter).
    """
    return F.get(F.transform(F.array(_col(col)), fn), 0)


def to_double_array(v: ColumnOrName) -> Column:
    """Cast array<float> → array<double> for stable arithmetic."""
    return _col(v).cast("array<double>")


def _dlit_sql(x: float) -> str:
    """SQL source for one double literal. ``repr`` emits the shortest
    string that round-trips the double exactly, and the parser's
    Double.parseDouble is correctly rounded, so the parsed literal is
    bit-identical to ``F.lit(x)`` (probe-verified over subnormals, max
    double, -0.0 and 200 random bit patterns)."""
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def lit_doubles(vals) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) for x in vals])`` costs one py4j round trip per
    element — ~26 ms per 64-d vector, which made the literal-heavy ANN
    plans (codebooks, LUTs, centroid arrays) spend SECONDS of driver time
    in plan construction before any job ran (guide §7.3: planning time as
    the bottleneck). One ``F.expr`` call parses the same CreateArray-of-
    Literals tree in the JVM ~9× faster; resolved trees and values are
    identical."""
    if len(vals) == 0:  # len(), not truthiness: numpy arrays reject bool()
        return F.expr("CAST(array() AS array<double>)")
    return F.expr(
        "array(" + ",".join(_dlit_sql(float(x)) for x in vals) + ")"
    )


def lit_doubles_2d(rows) -> Column:
    """array<array<double>> literal via one parsed SQL expression (see
    :func:`lit_doubles`) — the nested-LUT / pre-sliced-codebook shape."""
    if len(rows) == 0:  # len(), not truthiness: numpy arrays reject bool()
        return F.expr("CAST(array() AS array<array<double>>)")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit_sql(float(x)) for x in r) + ")"
            for r in rows
        )
        + ")"
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL source of dot()'s exact fold over two pre-rendered operand
    expressions (backticked names or literal array sources)."""
    return (
        f"aggregate(zip_with({a}, {b}, (_vx, _vy) -> _vx * _vy), "
        f"0.0D, (_vacc, _vx) -> _vacc + _vx)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Σ aᵢ·bᵢ as a sequential fold (zip_with + aggregate).

    Mirrors /root/reference/src/similarity.rs:10-13 (`dot`). Sequential
    left-to-right accumulation matches the oracle's evaluation order.

    Column NAMES take a one-parsed-SQL fast path (round-12, guide §7.3
    — ~250 py4j round trips on the builder path); Column inputs keep the
    builder. Equality pinned by tests/test_r12_fastpaths.py.
    """
    if _is_simple_name(a) and _is_simple_name(b):
        return F.expr(_dot_sql(f"`{a}`", f"`{b}`"))
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: ColumnOrName) -> Column:
    """L2 norm √Σ aᵢ² (reference similarity.rs:15-17 via dot(a,a))."""
    if _is_simple_name(a):
        return F.expr(_norm_sql(f"`{a}`"))
    return F.sqrt(dot(a, a))


def l2_normalize(a: ColumnOrName) -> Column:
    """v / ‖v‖ in one pass: the array and its norm each bind to a lambda
    variable, so the norm's fold runs once per ROW — pre-normalizing a
    corpus turns every downstream pairwise cosine into a single dot
    (vs dot + two norm folds per pair).

    Zero-norm inputs yield NaN components — the same contract as
    ``cosine`` (reference's IEEE division, similarity.rs:10-22); under
    Spark 4's default ANSI mode the bare x/0 would otherwise be a hard
    DIVIDE_BY_ZERO job failure.

    Column NAMES take a one-parsed-SQL twin of the nested binds (~560
    py4j round trips on the builder path)."""
    if _is_simple_name(a):
        return F.expr(
            "get(transform(array(`{a}`), _la -> "
            "get(transform(array({n}), _ln -> "
            "transform(_la, _lx -> CASE WHEN _ln = 0.0D THEN "
            "CAST('NaN' AS DOUBLE) ELSE _lx / _ln END)), 0)), 0)".format(
                a=a, n=_norm_sql("_la")
            )
        )
    return bind(
        _col(a),
        lambda arr: bind(
            norm(arr),
            lambda n: F.transform(
                arr,
                lambda x: F.when(n == 0.0, F.lit(float("nan"))).otherwise(x / n),
            ),
        ),
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity dot/(‖a‖‖b‖) (reference similarity.rs:5-24).

    The reference errors on length mismatch (similarity.rs:7-9); zip_with
    pads with null which poisons the aggregate to null — callers that want
    strict behavior use `check_uniform_dim` at ingest instead.

    Zero-norm inputs score NaN, matching the reference's IEEE f32 division
    (similarity.rs:10-22) — under Spark 4's default ANSI mode the bare 0/0
    would instead be a hard DIVIDE_BY_ZERO job failure (hypothesis-caught:
    a subnormal-only vector's norm underflows to exactly 0.0). The caller's
    NaN policy (VectorIndex.search strict/drop) then decides.

    Column NAMES take a one-parsed-SQL fast path (~900 py4j round trips
    on the builder path — the heaviest composite builder in the repo).
    """
    if _is_simple_name(a) and _is_simple_name(b):
        na, nb = _norm_sql(f"`{a}`"), _norm_sql(f"`{b}`")
        return F.expr(
            f"CASE WHEN ({na} * {nb}) = 0.0D THEN CAST('NaN' AS DOUBLE) "
            f"ELSE {_dot_sql(f'`{a}`', f'`{b}`')} / ({na} * {nb}) END"
        )
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(dot(a, b) / denom)


def cosine_to_literal(v: ColumnOrName, q: list[float]) -> Column:
    """Cosine of each row against one fixed query vector.

    The query's norm is folded to a Python-side constant so the per-row work
    is one fused dot+norm pass — this is the kernel of the search hot path
    (reference db.rs:250 scoring loop) and stays fully inside codegen.
    """
    qnorm = sum(x * x for x in q) ** 0.5
    # Spark 4 runs ANSI SQL by default, so 0/0 would be DIVIDE_BY_ZERO
    # instead of the reference's IEEE NaN (f32 division, similarity.rs:
    # 10-22); restore NaN explicitly so zero-norm vectors score NaN and
    # the caller's NaN policy (VectorIndex.search strict/drop) decides.
    if _is_simple_name(v):
        # one parsed SQL string: the query literal embeds via _dlit_sql
        # (bit-identical to F.lit) and the whole scoring kernel — the ANN
        # hot path — costs one py4j round trip to build
        arr = (
            "array(" + ",".join(_dlit_sql(float(x)) for x in q) + ")"
            if len(q)
            else "CAST(array() AS array<double>)"
        )
        denom_sql = f"({_norm_sql(f'`{v}`')} * {_dlit_sql(float(qnorm))})"
        return F.expr(
            f"CASE WHEN {denom_sql} = 0.0D THEN CAST('NaN' AS DOUBLE) "
            f"ELSE {_dot_sql(f'`{v}`', arr)} / {denom_sql} END"
        )
    denom = norm(v) * F.lit(qnorm)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot(v, lit_doubles(q)) / denom
    )


def euclidean(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance √Σ(aᵢ−bᵢ)² (reference similarity.rs:26-43).

    Used by projected-mode search — where, unlike the reference's
    farthest-k bug (SURVEY.md §2.3), our callers order ASCENDING.
    """
    if _is_simple_name(a) and _is_simple_name(b):
        return F.expr(_euclid_sql(f"`{a}`", f"`{b}`"))
    return F.sqrt(
        F.aggregate(
            F.zip_with(_col(a), _col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _euclid_sql(a: str, b: str) -> str:
    return (
        f"sqrt(aggregate(zip_with({a}, {b}, (_vx, _vy) -> "
        f"(_vx - _vy) * (_vx - _vy)), 0.0D, (_vacc, _vx) -> _vacc + _vx))"
    )


def euclidean_to_literal(v: ColumnOrName, q: list[float]) -> Column:
    """Euclidean distance of each row to one fixed query vector."""
    if _is_simple_name(v):
        arr = (
            "array(" + ",".join(_dlit_sql(float(x)) for x in q) + ")"
            if len(q)
            else "CAST(array() AS array<double>)"
        )
        return F.expr(_euclid_sql(f"`{v}`", arr))
    return euclidean(v, lit_doubles(q))


# ---------------------------------------------------------------------------
# 8-bit scalar quantization (reference packed_vector.rs:11-35)
# ---------------------------------------------------------------------------
#
# pack:   bin = round((x - min) / (max - min) * 255) clamped to [0, 255]
# unpack: x' = min + bin/255 * (max - min)
#
# The reference divides by zero when min == max (constant vector); we guard
# that case (FIXTURES.md §2 "quant edge") by defining the span as 1 when it
# is 0, which makes constant vectors round-trip exactly (bin = 0 → x' = min).


def quantize_bins(v: ColumnOrName) -> Column:
    """array<double> → array<smallint> of 0..255 bins.

    smallint (not tinyint) because Spark's tinyint is signed [-128,127];
    the stored width is still 1 byte after parquet dictionary/bit-packing.
    """
    v = _col(v)
    lo, hi = F.array_min(v), F.array_max(v)
    span = F.when(hi - lo == 0.0, F.lit(1.0)).otherwise(hi - lo)
    return F.transform(
        v,
        lambda x: F.least(
            F.lit(255.0), F.greatest(F.lit(0.0), F.round((x - lo) / span * 255.0))
        ).cast("smallint"),
    )


def quantize(v: ColumnOrName) -> Column:
    """Pack a vector into struct(qmin float, qmax float, quant array<smallint>).

    Storage cost per vector = d bytes + 8 bytes of range, matching the
    reference's 1.01 B/dim + overhead layout (packed_vector.rs:3-9,
    README.md:9-10) before parquet's own encoding shrinks it further.
    """
    v = _col(v)
    return F.struct(
        F.array_min(v).cast("float").alias("qmin"),
        F.array_max(v).cast("float").alias("qmax"),
        quantize_bins(v).alias("quant"),
    )


def dequantize(quant: ColumnOrName, qmin: ColumnOrName, qmax: ColumnOrName) -> Column:
    """Inverse map bin → double (reference packed_vector.rs:27-35).

    No zero-span guard here — nothing divides by the span, and when the
    stored (float32) range collapses to zero the correct inverse of every
    bin IS qmin. Substituting a fake span would instead invent values up
    to qmin+1 whenever a sub-float32 double range underflows to zero at
    store time (caught by hypothesis in test_property.py).
    """
    qmin_d = _col(qmin).cast("double")
    qmax_d = _col(qmax).cast("double")
    return F.transform(
        _col(quant), lambda b: qmin_d + b.cast("double") / 255.0 * (qmax_d - qmin_d)
    )


def dim(v: ColumnOrName) -> Column:
    """Vector dimension."""
    return F.size(_col(v))


def cosine_to_literal_pandas(v: ColumnOrName, q: list[float]):
    """Vectorized (Arrow/numpy) cosine against a fixed query vector — the
    Pandas-UDF alternative to the native ``cosine_to_literal`` fold.

    The native expression wins below a few hundred dims (it never leaves
    the JVM); at the reference's 1536 dims the Arrow batch transfer is
    amortized by one numpy matmul per batch instead of per-element
    interpreted folds — the same crossover that makes pca.py auto-pick its
    matmul form for large models. Results are IEEE double ops in a
    different summation order, so scores can differ from the fold by ulps:
    callers that hash-compare must stay on the native kernel.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(q, dtype=np.float64)
    qn = float(np.sqrt(qv @ qv))

    def _cos(col):
        m = np.stack(col.to_numpy())  # (batch, d)
        num = m @ qv
        den = np.sqrt((m * m).sum(axis=1)) * qn
        with np.errstate(invalid="ignore", divide="ignore"):
            return pd.Series(num / den)

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf signature parser rejects — set them as live objects
    _cos.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")(_col(v))
