"""TextRank: graph construction, damping fixpoint behavior, ranking.

Catalog parity for `textrank_keywords` is covered by
test_oracle_parity.py; these cover the operator's semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victor_spark.operators.textrank import (
    cooccurrence_edges,
    textrank_keywords,
    textrank_scores,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles data and spark sorts data"),
            (2, "one"),
            (3, ""),
            (4, "hub spoke1 hub spoke2 hub spoke3 hub spoke4"),
        ],
        "doc_id long, text string",
    )


def test_edges_are_symmetric_and_weighted(spark, docs):
    e = {
        (r.doc_id, r.u, r.v): r.w
        for r in cooccurrence_edges(docs, "doc_id", "text").collect()
    }
    # every edge has its reverse with the same weight
    assert all(e[(d, v, u)] == w for (d, u, v), w in e.items())
    # 'spark' is adjacent to 'shuffles' once and 'sorts' once in doc 1
    assert e[(1, "spark", "shuffles")] == 1
    assert e[(1, "data", "and")] == 1


def test_single_token_and_empty_docs_have_no_keywords(spark, docs):
    out = textrank_keywords(docs, "doc_id", "text").collect()
    assert {r.doc_id for r in out} == {1, 4}


def test_hub_token_ranks_first(spark, docs):
    out = textrank_keywords(docs, "doc_id", "text", top_k=1).collect()
    top4 = next(r for r in out if r.doc_id == 4)
    assert top4.keyword == "hub"  # degree-4 hub dominates the spokes


def test_scores_sum_is_conserved_on_regular_graphs(spark):
    # on a cycle (every node out-weight 1, in-weight 1) PageRank's
    # uniform vector is the exact fixpoint: all scores stay 1.0
    cyc = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    scores = textrank_scores(cyc, "doc_id", "text", iters=5).collect()
    assert len(scores) == 3
    for r in scores:
        assert r.pr == pytest.approx(1.0, abs=1e-9)


def test_more_iterations_move_toward_fixpoint(spark, docs):
    # path-like token graphs are near-bipartite, so scores OSCILLATE
    # with period 2 while converging — compare distance to a deep-run
    # fixpoint, not consecutive deltas
    def scores(iters):
        return {
            (r.doc_id, r.token): r.pr
            for r in textrank_scores(
                docs, "doc_id", "text", iters=iters
            ).collect()
        }

    s3, s9, fix = scores(3), scores(9), scores(40)
    e3 = max(abs(s3[k] - fix[k]) for k in fix)
    e9 = max(abs(s9[k] - fix[k]) for k in fix)
    assert e9 < e3
    # hub-spoke is strictly bipartite: the period-2 component decays as
    # 0.85^k, so after 9 rounds ~0.23 of its initial amplitude remains
    assert e9 < 0.85 ** 9 * 2.5


def test_rank_is_dense_per_doc(spark, docs):
    out = textrank_keywords(docs, "doc_id", "text", top_k=3).collect()
    for d in {r.doc_id for r in out}:
        ranks = sorted(r.rank for r in out if r.doc_id == d)
        assert ranks == list(range(1, len(ranks) + 1))


def test_textrank_rejects_reserved_id_col(spark):
    """Review-caught: id_col values colliding with internal column names
    ('token', 'w', ...) produced duplicate columns or
    AMBIGUOUS_REFERENCE mid-plan; they are rejected up front now."""
    import pytest

    from victor_spark.operators.textrank import cooccurrence_edges

    docs = spark.createDataFrame([(1, "a b c")], "token long, text string")
    with pytest.raises(ValueError, match="collides"):
        cooccurrence_edges(docs, "token", "text")


def test_keywords_farm_matches_scores_ranking(spark):
    """The Arrow-farm textrank_keywords (round-12 optimization) must
    reproduce the JVM textrank_scores recurrence exactly: same stabilized
    rounded scores, same (score desc, token asc) row_number ranking."""
    import random

    from pyspark.sql import Window

    random.seed(3)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(random.choice(vocab) for _ in range(random.randint(0, 40))))
        for i in range(40)
    ] + [(90, ""), (91, "one"), (92, "a a a a"), (93, "x y x y x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.keyword, r.score)
        for r in textrank_keywords(docs, "doc_id", "text", top_k=3).collect()
    }
    pr = textrank_scores(docs, "doc_id", "text", iters=3)
    score = F.round(F.col("pr") + F.lit(1e-9), 6)
    win = Window.partitionBy("doc_id").orderBy(score.desc(), F.asc("token"))
    want = {
        (r.doc_id, r.rank): (r.token, r.score)
        for r in pr.withColumn("score", score)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want
