"""Text-analysis column function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.functions import text as T


def _one(spark, s):
    return spark.createDataFrame([(s,)], "text string")


def _val(spark, s, col):
    return _one(spark, s).select(col.alias("x")).first()["x"]


def test_token_count(spark):
    assert _val(spark, "a b  c", T.token_count("text")) == 3
    assert _val(spark, "", T.token_count("text")) == 0


def test_word_count_regex(spark):
    assert _val(spark, "hello, world! 42", T.word_count("text")) == 3


def test_avg_token_len(spark):
    assert _val(spark, "ab cd", T.avg_token_len("text")) == 2.0
    assert _val(spark, "", T.avg_token_len("text")) == 0.0


def test_punct_ratio(spark):
    assert abs(_val(spark, "ab!?", T.punct_ratio("text")) - 0.5) < 1e-12
    assert _val(spark, "", T.punct_ratio("text")) == 0.0


def test_stopword_ratio(spark):
    assert abs(_val(spark, "the cat and dog", T.stopword_ratio("text")) - 0.5) < 1e-12


def test_quality_score_bounds(spark):
    q = _val(spark, "the quick brown fox is in the yard " * 10, T.quality_score("text"))
    assert 0.0 <= q <= 1.0
    assert q > 0.8  # long, clean, stopword-bearing text scores high


def test_lang_id_markers(spark):
    assert _val(spark, "der hund und die katze ist da", T.lang_id("text")) == "de"
    assert _val(spark, "the cat and the dog of the town", T.lang_id("text")) == "en"
    assert _val(spark, "xyzzy plugh", T.lang_id("text")) == "und"


def test_fingerprint_equal_for_equal_docs(spark):
    df = spark.createDataFrame(
        [(1, "some identical document text"), (2, "some identical document text"),
         (3, "a different text body here")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint64("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_term_counts_matches_grouped_counts(spark):
    """term_counts (row-local sorted-run scan) must equal the explode +
    groupBy multiset exactly — it replaced that shape in tfidf/bm25
    (round-12 optimization)."""
    import random

    from pyspark.sql import functions as F

    random.seed(11)
    vocab = ["a", "b", "cc", "ddd", "tok"]
    rows = [
        (i, " ".join(random.choice(vocab) for _ in range(random.randint(0, 30))))
        for i in range(50)
    ] + [(100, ""), (101, "   "), (102, None), (103, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = T.tokens(F.lower(F.col("text")))
    got = {
        (r["doc_id"], r["tc"]["tok"]): r["tc"]["c"]
        for r in df.select(
            "doc_id", F.explode(T.term_counts(t)).alias("tc")
        ).collect()
    }
    want = {
        (r["doc_id"], r["tok"]): r["c"]
        for r in df.select("doc_id", F.explode(t).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == want


def test_text_sql_fast_paths_match_builders(spark):
    """Round-11: column NAMES route quality_score/lang_id through one
    parsed SQL string; values must be IDENTICAL to the builder form
    (doubles bit-equal) over empty/NULL/unicode/stopword-heavy/marker
    edge cases, incl. the all-zero-marker 'und' arm and argmax ties."""
    from pyspark.sql import functions as F

    from victor_spark.functions.text import lang_id, quality_score

    rows = [
        ("",), (None,), ("the and of to in",), ("der die und das ist",),
        ("le la et les des el la los que de",),  # fr/es tie -> fr
        ("xyzzy plugh",), ("a. b! c? loooooooongword",),
        ("The AND Of tO iN mixed Case the the",),
        ("ünïcödé tøkens the and",), ((". " * 60).strip(),),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        quality_score("text").alias("qs"),
        quality_score(F.col("text")).alias("qb"),
        lang_id("text").alias("ls"),
        lang_id(F.col("text")).alias("lb"),
    ).collect()
    for r in got:
        assert r.qs == r.qb, r
        assert r.ls == r.lb, r
