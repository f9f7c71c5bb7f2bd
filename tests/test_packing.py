"""Sequence packing (operators/packing.py): contiguity, determinism,
chunk assignment."""

from __future__ import annotations

import pytest

from victor_spark.operators.packing import pack_sequences


def _docs(spark, n=40):
    rows = [(i, (i * 7) % 13) for i in range(n)]  # token counts 0..12
    return spark.createDataFrame(rows, "doc_id long, n_tok int")


def test_streams_are_contiguous(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_tok", seq_len=16, n_buckets=4)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= set(range(4))
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: r["start_off"])
        expect = 0
        for r in bucket_rows:
            assert r["start_off"] == expect
            expect += r["n_tok"]


def test_pack_id_is_start_chunk(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_tok", seq_len=16, n_buckets=4)
    for r in out.collect():
        assert r["pack_id"] == r["start_off"] // 16


def test_deterministic_across_runs_and_partitioning(spark):
    d = _docs(spark)
    a = {r["doc_id"]: (r["bucket"], r["start_off"]) for r in
         pack_sequences(d, "doc_id", "n_tok", 16, 4).collect()}
    b = {r["doc_id"]: (r["bucket"], r["start_off"]) for r in
         pack_sequences(d.repartition(7), "doc_id", "n_tok", 16, 4).collect()}
    assert a == b


def test_zero_token_docs_keep_slot(spark):
    d = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 3)], "doc_id long, n_tok int"
    )
    out = pack_sequences(d, "doc_id", "n_tok", seq_len=8, n_buckets=1)
    rows = sorted(out.collect(), key=lambda r: r["start_off"])
    # total stream length is preserved; the empty doc sits between neighbors
    assert rows[-1]["start_off"] + rows[-1]["n_tok"] == 8
    assert len(rows) == 3


def test_bad_args_raise(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        pack_sequences(d, "doc_id", "n_tok", 0, 4)
    with pytest.raises(ValueError):
        pack_sequences(d, "doc_id", "n_tok", 16, 0)
