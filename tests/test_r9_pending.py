"""Round-9 query family (plans/catalog_r9.py): registered into the live
catalog at round-9 start. tests/test_oracle_parity.py now covers the
family at the smoke SF like any other query; this module keeps the
DRIVER-SF parity run (the gate compares at sf0.01, not sf0.001) and the
family's plan-shape assertions."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, SF_T2
from tests.oracle_utils import compare, duck_connect
from victor_spark.plans import QUERIES
from victor_spark.plans.catalog_r9 import PENDING


def test_round9_family_is_registered():
    """The round-9 merge landed: every catalog_r9 query is in the live
    registry under the SAME spec object (not a divergent copy), and the
    never-green gate tier fronts whatever has no driver row yet (pinned
    generically by test_gate_order; this asserts the merge identity)."""
    assert PENDING
    for name, spec in PENDING.items():
        assert QUERIES.get(name) is spec, name
        sql = spec.oracle_sql(SF_SMOKE)
        assert sql and "SELECT" in sql.upper(), name


@pytest.mark.parametrize("name", sorted(PENDING))
def test_r9_query_matches_oracle_at_driver_sf(spark, name):
    # the driver gate's own SF — the smoke-SF run lives in
    # test_oracle_parity.py with the rest of the catalog
    spec = PENDING[name]
    con = duck_connect(SF_T2)
    sdf = spec.build(spark, SF_T2)
    odf = con.execute(spec.oracle_sql(SF_T2)).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


# ---------------------------------------------------------------------------
# plan-shape assertions: the staged queries' scale claims, enforced the
# same way tests/test_plans.py enforces them for the live catalog
# ---------------------------------------------------------------------------


def _plan(spark, name: str) -> str:
    df = PENDING[name].build(spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_intra_doc_dedup_is_one_shuffle_free_projection(spark):
    # the whole point vs line_dedup_global: no explode/groupBy round-trip
    p = _plan(spark, "line_dedup_intra_doc")
    assert "Exchange" not in p
    assert "EvalPython" not in p  # pure codegen, no Python


def test_robots_filter_is_shuffle_free_codegen(spark):
    # rules ride the plan as literals; the politeness gate costs one scan
    p = _plan(spark, "robots_filter")
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_url_host_stats_is_single_partial_agg_shuffle(spark):
    p = _plan(spark, "url_host_stats")
    assert p.count("hashpartitioning(") == 1
    assert "partial_count" in p  # map-side combine before the exchange
    assert "EvalPython" not in p


def test_matryoshka_both_phases_are_bounded_heaps(spark):
    p = _plan(spark, "ann_matryoshka_rescore")
    # query vector broadcast, corpus never hash/range-shuffled for the
    # shortlist (the 50-row tail window after the heap is irrelevant)
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_url_canonical_dedup_is_single_exchange(spark):
    p = _plan(spark, "dedup_url_canonical")
    assert p.count("hashpartitioning(") == 1
    assert "EvalPython" not in p


def test_crawl_admission_is_dim_join_projection(spark):
    # the 35-row rule dim broadcasts; the url relation never shuffles
    # and no Python runs — admission costs what a projection costs
    p = _plan(spark, "crawl_admission")
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "EvalPython" not in p


def test_fim_transform_is_shuffle_free_codegen(spark):
    # FIM is a map over the corpus at data-prep time — one scan, no
    # exchange, no Python
    p = _plan(spark, "fim_transform")
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_hard_negatives_broadcasts_queries_no_corpus_shuffle(spark):
    # label filter + scoring ride the scan; only the per-query rank
    # window shuffles (on the 8-query key, WindowGroupLimit-bounded)
    p = _plan(spark, "hard_negatives")
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p


def test_retrieval_ndcg_broadcasts_queries_no_corpus_shuffle(spark):
    # the corpus is scored against the broadcast query side; only the
    # per-query rank window and the two small aggregations shuffle
    p = _plan(spark, "retrieval_ndcg")
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_bpe_roundtrip_decode_is_codegen_not_python(spark):
    # encode is the sanctioned Arrow-batched mapInPandas; decode must
    # NOT add a second Python hop — it is a pure projection
    p = _plan(spark, "bpe_roundtrip")
    assert p.count("EvalPython") <= 1  # the encode farm only
    assert "CartesianProduct" not in p


def test_host_pagerank_no_node_sized_broadcast_hint(spark):
    # r8 verdict item 1: ranks/contributions/out-weights are node-sized
    # (tens of millions of hosts on a real crawl graph), so NOTHING in
    # the 3-iteration plan may carry an explicit broadcast hint — the
    # analyzed logical plan must contain ZERO ResolvedHint nodes; the
    # small-graph fast path is AQE's stats-driven broadcast, never a
    # hand hint that would pin a multi-GB repeated broadcast at scale.
    # The folded edge matrix is a loop invariant: exactly one
    # checkpointed relation feeds all three iterations.
    df = PENDING["host_pagerank"].build(spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
    p = _plan(spark, "host_pagerank")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_crawl_pipeline_plan_shapes(spark):
    # the capstone's two halves carry distinct scale claims.
    # (a) discovery->gate->frontier->fetch->render (the shard-writer
    # input): pure codegen — NO Python anywhere before the WARC writer —
    # and the only broadcast hint is the RFC-capped rule dim.
    from victor_spark.plans.catalog_r9 import _crawl_fetch_pages

    pages = _crawl_fetch_pages(spark, SF_SMOKE)
    analyzed = pages._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 1  # rules dim only
    pre = pages._sc._jvm.PythonSQLUtils.explainString(
        pages._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in pre
    assert "EvalPython" not in pre
    # (b) shards->extract->c4->dedup->quality: exactly ONE Python stage
    # (the Arrow-batched WARC record walk); extraction and curation are
    # codegen projections; the only shuffle is the content-dedup groupBy
    # — no join of any kind after the shards
    import re

    p = _plan(spark, "crawl_pipeline")
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1  # record walk
    assert "EvalPython" not in p  # no row-at-a-time Python anywhere
    assert "CartesianProduct" not in p
    assert "Join" not in p
