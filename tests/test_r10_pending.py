"""Round-10 staged queries (plans/catalog_r10.py): full driver-gate
parity NOW, registration at round-10 start (round 9's gate window is
exactly full — 16 registered + 34 r6-tier; see catalog_r10's module
docstring). These tests run the exact compare the driver gate runs, at
BOTH the smoke SF and the gate's own SF."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, SF_T2
from tests.oracle_utils import compare, duck_connect
from victor_spark.plans import QUERIES
from victor_spark.plans.catalog_r10 import PENDING


def test_r10_pending_queries_are_not_registered():
    """Staging invariant: nothing here may leak into the live registry
    (it would evict r6-tier queries from the round-9 gate window)."""
    assert PENDING
    assert not set(PENDING) & set(QUERIES)


def test_round10_registration_dry_run():
    """The round-10 merge must be safe the day it lands: names unique,
    every staged spec carries a resolvable oracle, and the never-green
    tier (these + any r9 stragglers) fits a 50-row gate window."""
    from victor_spark.plans import catalog as cat

    merged = dict(QUERIES)
    merged.update(PENDING)
    assert len(merged) == len(QUERIES) + len(PENDING)
    for name, spec in PENDING.items():
        sql = spec.oracle_sql(SF_SMOKE)
        assert sql and "SELECT" in sql.upper(), name
    last_green = cat._last_green_rounds()
    never = [n for n in merged if n not in last_green]
    assert set(PENDING) <= set(never)


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_T2])
@pytest.mark.parametrize("name", sorted(PENDING))
def test_r10_pending_query_matches_oracle(spark, name, sf):
    spec = PENDING[name]
    con = duck_connect(sf)
    sdf = spec.build(spark, sf)
    odf = con.execute(spec.oracle_sql(sf)).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


# ---------------------------------------------------------------------------
# plan-shape assertions: the staged queries' scale claims
# ---------------------------------------------------------------------------


def _plan(spark, name: str) -> str:
    df = PENDING[name].build(spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_kneser_ney_is_codegen_with_partial_aggs(spark):
    # the LM-family shape: type-table aggregations map-side combined, no
    # Python, no cartesian (the 1-row bigram-type count broadcasts)
    p = _plan(spark, "kneser_ney_bigram")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "partial_count" in p or "partial_sum" in p


def test_phrase_search_filters_before_postings(spark):
    # the contains() prefilter must reach the scan operator's Filter
    # (before any exchange), and only the two terms' postings shuffle;
    # no Python anywhere
    p = _plan(spark, "phrase_search")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "Contains" in p  # the lossless candidate prefilter survives


def test_fertility_is_one_arrow_farm_plus_tiny_agg(spark):
    # exactly one Python stage (the sanctioned BPE encode farm); the
    # language/ratio arithmetic is codegen; output is a per-language
    # aggregation of integer sums
    import re

    p = _plan(spark, "tokenizer_fertility")
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_maxsim_is_codegen_scan_plus_bounded_heap(spark):
    # per-token embeddings, maxes and the sum are one bound projection;
    # the top-10 is a bounded heap — no shuffle before it, no Python
    p = _plan(spark, "late_interaction_maxsim")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p


def test_cdc_chunking_is_one_arrow_farm_hashes_only_shuffle(spark):
    # the rolling-hash chunker is ONE Arrow-batched numpy farm (the
    # decode family's pattern — an interpreted pure-codegen HOF chunker
    # measured 50x slower); only chunk HASHES shuffle (argmin + the
    # per-doc dup count), never payload bytes, and the farm's output is
    # checkpointed so both consumers read it once
    import re

    p = _plan(spark, "cdc_chunk_dedup")
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) <= 1
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "partial_min" in p or "partial_count" in p


def test_soft_dedup_corpus_weight_join_is_broadcast(spark):
    # the cluster-weight table is duplicate-minority sized and rides a
    # broadcast join onto the corpus (the minhash pipeline's internal
    # candidate/verify joins shuffle by design — pinned by the dedup
    # family's own plan tests — so no global no-SMJ claim here)
    p = _plan(spark, "soft_dedup_weights")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p and "LeftOuter" in p


def test_doremi_is_lm_shape_with_tiny_tails(spark):
    # the LM family's explode + distribution join feeding two tiny
    # aggregations; the 1-row reference/total/normalizer dims broadcast,
    # no Python, no cartesian blowup (crossJoins are 1-row broadcasts)
    p = _plan(spark, "domain_mix_doremi")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_winnowing_is_codegen_fingerprint_join(spark):
    # per-doc winnow sets are one codegen projection; the pair stage is
    # an equi-join on the fingerprint key + a bounded top-20 — no
    # Python, no cartesian
    p = _plan(spark, "winnow_fingerprints")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
