"""BPE training: classic merge behavior on a known corpus + encode path."""

from __future__ import annotations

from victor_spark.operators.bpe import apply_bpe, train_bpe_merges, word_counts


def _corpus(spark):
    # classic BPE toy corpus: 'low' x5, 'lowest' x2, 'newer' x6, 'wider' x3
    rows = [("low " * 5,), ("lowest " * 2,), ("newer " * 6,), ("wider " * 3,)]
    return spark.createDataFrame(rows, "text string")


def test_word_counts(spark):
    wc = {r["word"]: r["n"] for r in word_counts(_corpus(spark), "text").collect()}
    assert wc == {"low": 5, "lowest": 2, "newer": 6, "wider": 3}


def test_merges_follow_pair_frequencies(spark):
    m = train_bpe_merges(_corpus(spark), "text", num_merges=4).collect()
    assert [r["rank"] for r in m] == [1, 2, 3, 4]
    # 'er' appears in newer(6) + wider(3) = 9, the clear winner
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("e", "r", 9)
    # after er: 'n e' (6) and 'w er' (6) and 'l o' (7): lo wins at 7
    assert (m[1]["left"], m[1]["right"]) == ("l", "o")
    # merged symbols feed later rounds (merged column is concatenation)
    assert all(r["merged"] == r["left"] + r["right"] for r in m)


def test_merges_deterministic(spark):
    a = train_bpe_merges(_corpus(spark), "text", num_merges=5).collect()
    b = train_bpe_merges(_corpus(spark), "text", num_merges=5).collect()
    assert a == b


def test_apply_bpe_roundtrip(spark):
    m = train_bpe_merges(_corpus(spark), "text", num_merges=4).collect()
    merges = [(r["left"], r["right"]) for r in m]
    enc = apply_bpe(_corpus(spark).limit(1), "text", merges)
    row = enc.first()
    # concatenating the bpe tokens reproduces the original characters
    assert "".join(row["bpe_tokens"]) == "".join(str(row["text"]).lower().split())
    # merges lo (rank 2) then lo+w (rank 3) fully fuse the word 'low'
    assert "low" in row["bpe_tokens"]
