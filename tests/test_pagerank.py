"""operators/pagerank.py: the reusable damped-PageRank operator
(host_pagerank's generalization — that catalog query's DuckDB oracle
pins the big case; these pin the operator's own contracts)."""

from __future__ import annotations

import pytest

from victor_spark.operators.pagerank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_cycle_stays_uniform(spark):
    # a k-cycle's stationary distribution is uniform, and uniform is a
    # fixed point of every damped iteration — any iteration count must
    # return exactly 1/k per node
    got = _ranks(spark, [(0, 1), (1, 2), (2, 0)], iterations=4)
    assert set(got) == {0, 1, 2}
    for v in got.values():
        # DECIMAL(20,12) contribution sums truncate at 1e-12 per round
        assert v == pytest.approx(1.0 / 3.0, abs=1e-10)


def test_one_iteration_hand_computed_star(spark):
    # 0->1, 0->2 (equal split), 1->0, 2->0. After one damped iteration
    # from uniform 1/3: r(0) = 0.05 + 0.85*(1/3 + 1/3), r(1) = r(2) =
    # 0.05 + 0.85*(1/6)
    got = _ranks(spark, [(0, 1), (0, 2), (1, 0), (2, 0)], iterations=1)
    assert got[0] == pytest.approx(0.05 + 0.85 * (2.0 / 3.0), abs=1e-9)
    assert got[1] == pytest.approx(0.05 + 0.85 / 6.0, abs=1e-9)
    assert got[2] == pytest.approx(got[1], abs=1e-15)


def test_dangling_mass_is_dropped_not_redistributed(spark):
    # 0->1 and 1 dangles: node 1 redistributes nothing, so total rank
    # sinks below 1 — the documented host-rank semantics (relative
    # ordering, not a probability distribution)
    got = _ranks(spark, [(0, 1)], iterations=2)
    assert got[1] > got[0]
    assert sum(got.values()) < 1.0


def test_parallel_edges_fold_and_match_explicit_weights(spark):
    # two parallel 0->1 rows must equal one row with weight 2
    multi = _ranks(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)],
                   iterations=3)
    w = {
        r["node"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(
                [(0, 1, 2), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
                "src long, dst long, w long",
            ),
            weight="w",
            iterations=3,
        ).collect()
    }
    assert multi == w


def test_fractional_weights_are_honored_not_truncated(spark):
    # review-caught: a long cast turned 0.5 into 0, zeroing the source's
    # out-weight and dividing by zero. Halved equal weights carry the
    # same FRACTIONS as unit weights, so the ranks must match exactly.
    def run(wvals):
        return {
            r["node"]: r["rank"]
            for r in pagerank(
                spark.createDataFrame(
                    [(0, 1, wvals[0]), (0, 2, wvals[1]), (1, 0, wvals[2]),
                     (2, 0, wvals[3])],
                    "src long, dst long, w double",
                ),
                weight="w",
                iterations=2,
            ).collect()
        }
    assert run([0.5, 0.5, 1.0, 1.0]) == run([1.0, 1.0, 1.0, 1.0])


def test_non_positive_weights_raise(spark):
    # the POSITIVE-weights contract is enforced, not just documented:
    # a negative, zero, or NULL weight must fail fast with a clear
    # message instead of silently corrupting ranks or hitting ANSI
    # DIVIDE_BY_ZERO deep inside an iteration job (review-caught)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    for bad in (-1.0, 0.0, None):
        # pagerank() itself runs the node count, so the guard fires at
        # call time — first touch, before any iteration job
        with pytest.raises((PySparkException, Py4JJavaError)) as exc:
            pagerank(
                spark.createDataFrame(
                    [(0, 1, 1.0), (1, 0, bad)],
                    "src long, dst long, w double",
                ),
                weight="w",
                iterations=1,
            ).collect()
        assert "weights must be positive" in str(exc.value)


def test_bad_weight_on_self_loop_still_raises(spark):
    # advice-caught round 10: validation used to run AFTER the
    # self-loop filter, so a NULL/zero/negative weight on a self-loop
    # row silently passed the "weights must be POSITIVE — enforced"
    # contract. Enforcement now precedes the filter: the contract holds
    # on EVERY edge row, including ones the algorithm then drops.
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    for bad in (-1.0, 0.0, None):
        with pytest.raises((PySparkException, Py4JJavaError)) as exc:
            pagerank(
                spark.createDataFrame(
                    [(0, 1, 1.0), (1, 0, 1.0), (1, 1, bad)],
                    "src long, dst long, w double",
                ),
                weight="w",
                iterations=1,
            ).collect()
        assert "weights must be positive" in str(exc.value)


def test_self_loops_dropped_and_bad_iterations_raise(spark):
    got = _ranks(spark, [(0, 0), (0, 1), (1, 0)], iterations=2)
    # with the self-loop dropped this is the 2-cycle: uniform 1/2
    assert got[0] == pytest.approx(0.5, abs=1e-10)
    with pytest.raises(ValueError, match="iterations"):
        _ranks(spark, [(0, 1)], iterations=0)


def test_no_node_sized_broadcast_hint_in_plan(spark):
    # the operator-level twin of the catalog query's plan assertion:
    # zero ResolvedHint nodes — the small-graph fast path is AQE's
    # stats-driven broadcast, never a hand hint
    df = pagerank(
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long"),
        iterations=2,
    )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
