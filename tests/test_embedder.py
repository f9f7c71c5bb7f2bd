"""Embed-and-insert path (reference S3/S4/Q1 — tests.rs:145-161 analog).

The hash embedder is deterministic token-overlap similarity, so the
reference's semantic test ('hawaiian pizza' → 'pineapple') becomes a
token-overlap test with the same shape: the query retrieves the document
sharing its tokens, not the unrelated one.
"""

from __future__ import annotations

import math

from victor_spark.functions.embedder import embed_query, _embed_one
from victor_spark.index import VectorIndex


def test_embedder_deterministic_and_normalized():
    a = _embed_one("spark is a distributed engine", 64)
    b = _embed_one("spark is a distributed engine", 64)
    assert a == b
    assert abs(math.sqrt(sum(x * x for x in a)) - 1.0) < 1e-6


def test_udf_matches_driver_side(spark):
    from pyspark.sql import functions as F
    from victor_spark.functions.embedder import embed

    df = spark.createDataFrame([("hello world",)], "t string")
    got = df.select(embed("t", 64).alias("e")).first()["e"]
    want = _embed_one("hello world", 64)
    assert all(abs(g - w) < 1e-6 for g, w in zip(got, want))


def test_add_and_text_search_end_to_end(spark, tmp_path):
    idx = VectorIndex(spark, str(tmp_path / "idx"))
    idx.add(
        ["pineapple pizza with ham and cheese", "rocks and stones and gravel"],
        tags=["food-or-not"],
    )
    hit = idx.search_text("hawaiian pizza with pineapple", k=1).first()
    assert "pineapple" in hit["content"]


# -- backend seam (reference db.rs:102-114 uses fastembed bge-small) --------


def test_custom_backend_drives_add_and_search(spark, tmp_path):
    from victor_spark.functions import embedder

    # defined inside the test so cloudpickle ships it BY VALUE to the
    # executors (a test-module reference would not import there) — a real
    # deployment registers a function from an installed package
    def _toy_encode(texts):
        out = []
        for t in texts:
            t = (t or "").lower()
            out.append([
                1.0 if "pizza" in t else 0.0,
                1.0 if "rock" in t else 0.0,
                1.0 if "music" in t else 0.0,
                0.1,
            ])
        return out

    embedder.set_backend(_toy_encode, dim=4)
    try:
        idx = VectorIndex(spark, str(tmp_path / "cidx"))
        idx.add(["pizza with extra cheese", "rocks and gravel",
                 "loud music all night"], dim=4)
        assert idx.dimension() == 4
        hit = idx.search_text("music festival", k=1).first()
        assert "music" in hit["content"]
        # embed_query goes through the same backend as the batch path
        assert embedder.embed_query("pizza")[0] == 1.0
    finally:
        embedder.set_backend(None)


def test_env_model_backend_parsing(monkeypatch):
    from victor_spark.functions import embedder

    monkeypatch.setenv(embedder.EMBEDDER_ENV, "model:BAAI/bge-small-en-v1.5")
    kind, name, _ = embedder.backend_spec()
    assert (kind, name) == ("model", "BAAI/bge-small-en-v1.5")
    monkeypatch.delenv(embedder.EMBEDDER_ENV)
    assert embedder.backend_spec()[0] == "hash"


def test_env_model_backend_without_libs_raises_clearly(monkeypatch):
    import pytest

    from victor_spark.functions import embedder

    try:
        import sentence_transformers  # noqa: F401
        pytest.skip("sentence-transformers installed; error path not reachable")
    except ImportError:
        pass
    try:
        import fastembed  # noqa: F401
        pytest.skip("fastembed installed; error path not reachable")
    except ImportError:
        pass
    monkeypatch.setenv(embedder.EMBEDDER_ENV, "model:BAAI/bge-small-en-v1.5")
    with pytest.raises(ImportError, match="sentence-transformers nor fastembed"):
        embedder.embed_query("hello")


def test_real_model_end_to_end_if_installed(spark, tmp_path, monkeypatch):
    """The reference-parity integration (tests.rs:145-161 with real
    weights): runs only where a model library + weights are available."""
    import pytest

    pytest.importorskip("sentence_transformers")
    from victor_spark.functions import embedder

    monkeypatch.setenv(embedder.EMBEDDER_ENV,
                       "model:sentence-transformers/all-MiniLM-L6-v2")
    idx = VectorIndex(spark, str(tmp_path / "midx"))
    idx.add(["a slice of hawaiian pizza", "a pile of grey rocks"])
    hit = idx.search_text("pineapple on pizza", k=1).first()
    assert "pizza" in hit["content"]


def test_hash_embedder_splits_on_space_only():
    # the whole catalog tokenizes by splitting on ' ' (functions/text.py::
    # tokens ↔ the oracles' string_split); Python's bare .split() also eats
    # tabs/newlines, which silently diverges from every SQL twin
    # (edge-testdata-caught) — lock the space-only contract
    from victor_spark.functions.embedder import _embed_one

    assert _embed_one("a\tb", 16) != _embed_one("a b", 16)  # one token vs two
    assert _embed_one("a  b", 16) == _embed_one("a b", 16)  # empties dropped


def test_batch_embed_bit_exact_vs_scalar_reference():
    """Round-11: the vectorized batch path (np.add.at + memo) must be
    BIT-identical to the per-row scalar reference — the ±1 accumulations
    and squared-norm sums are exact integers in float64, so summation
    order cannot change them; sqrt/divide/float32-cast are the same IEEE
    ops. Covers NULL/empty text, repeated tokens, unicode, long docs,
    and the warm-memo second pass."""
    import numpy as np
    import pandas as pd

    from victor_spark.functions.embedder import _embed_texts

    cases = [
        "hello world hello", "", None, "a  b\tc", "ünïcödé tøkens",
        "x " * 500, "the the the the", " leading and trailing ",
    ]
    for _pass in range(2):  # second pass exercises the token memo
        got = _embed_texts(pd.Series(cases), 64)
        for t, v in zip(cases, got):
            ref = np.asarray(_embed_one(t or "", 64), dtype=np.float32)
            assert (v == ref).all(), repr(t)
