"""Chunking: window coverage, overlap contract, edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from victor_spark.operators.chunking import chunk_tokens


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30))),  # 30 tokens
            (2, "only four little tokens"),             # 4 tokens (< size)
            (3, ""),                                    # empty -> no chunks
            (4, " ".join(f"x{i}" for i in range(16))),  # exactly one window
        ],
        "doc_id long, text string",
    )


def _chunks(spark, docs, **kw):
    out = chunk_tokens(docs, "doc_id", "text", **kw).collect()
    return {(r.doc_id, r.chunk_id): r.chunk_tokens for r in out}


def test_window_count_and_overlap(spark, docs):
    ch = _chunks(spark, docs, chunk_size=16, overlap=4)
    # 30 tokens, stride 12 -> starts 0, 12 -> ceil((30-16)/12)=2 extra? no:
    # 1 + ceil(14/12) = 1 + 2 = 3 chunks (starts 0, 12, 24)
    ids = sorted(c for d, c in ch if d == 1)
    assert ids == [0, 1, 2]
    # consecutive windows share exactly `overlap` tokens
    assert ch[(1, 0)][12:] == ch[(1, 1)][:4]
    assert ch[(1, 1)][12:] == ch[(1, 2)][:4]


def test_every_token_is_covered(spark, docs):
    ch = _chunks(spark, docs, chunk_size=16, overlap=4)
    covered = set()
    for (d, c), toks in ch.items():
        if d == 1:
            covered.update(toks)
    assert covered == {f"w{i}" for i in range(30)}


def test_short_and_exact_docs_get_one_chunk(spark, docs):
    ch = _chunks(spark, docs, chunk_size=16, overlap=4)
    assert sorted(c for d, c in ch if d == 2) == [0]
    assert len(ch[(2, 0)]) == 4  # short doc: one truncated window
    assert sorted(c for d, c in ch if d == 4) == [0]
    assert len(ch[(4, 0)]) == 16


def test_empty_doc_emits_no_chunks(spark, docs):
    ch = _chunks(spark, docs, chunk_size=16, overlap=4)
    assert not any(d == 3 for d, _ in ch)


def test_zero_overlap_partitions_exactly(spark, docs):
    ch = _chunks(spark, docs, chunk_size=10, overlap=0)
    toks = []
    for c in sorted(c for d, c in ch if d == 1):
        toks.extend(ch[(1, c)])
    assert toks == [f"w{i}" for i in range(30)]  # exact partition, order kept


def test_invalid_overlap_rejected(spark, docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, "doc_id", "text", chunk_size=8, overlap=8)
