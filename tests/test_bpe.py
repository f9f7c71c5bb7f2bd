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


def test_ranked_encode_equals_rank_order_scan(spark):
    """The rank-priority encode must be EXACTLY the rank-order scan
    (Hypothesis-style sweep over structured + adversarial words with a
    synthetic 2k-merge prefix-chain table): firing merge k can never
    create a pair of rank < k, so lowest-rank-present == rank order
    restricted to firing pairs. A divergence here silently corrupts
    every BPE catalog oracle."""
    import random

    from victor_spark.operators.bpe import apply_bpe

    random.seed(3)
    syll = ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"]
    words = list({
        "".join(random.choice(syll) for _ in range(random.randint(1, 5)))
        for _ in range(3000)
    })
    merges, seen = [], set()
    for w in words:
        for i in range(1, len(w)):
            p = (w[:i], w[i])
            if p not in seen:
                seen.add(p)
                merges.append(p)
        if len(merges) >= 2000:
            break
    merges = merges[:2000]

    # the old substring-prune rank-order scan, kept here as the spec
    fused_list = [(l, r, l + r) for l, r in merges]

    def encode_spec(word):
        syms = list(word)
        for left, right, fused in fused_list:
            if fused not in word:
                continue
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    probe = sorted(set(words[:400] + [
        "", "x", "thth", "ththth", "qqq", "thx", "xth",
        "".join(random.choice("theinqz") for _ in range(30)),
    ]))
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(probe)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe(docs, "text", merges).collect()
    }
    for i, w in enumerate(probe):
        want = [t for part in w.lower().split(" ") if part
                for t in encode_spec(part)]
        assert got[i] == want, (w, got[i], want)


def test_anomalous_merge_table_falls_back_to_scan_semantics(spark):
    """The ranked-loop equivalence precondition, exercised at its
    counterexample: merges [("bc","d"), ("b","c")] — rank 1 CREATES
    rank 0's left operand, so after (b,c) fires the priority loop would
    also fire (bc,d), while the single-pass rank-order scan (the
    oracles' semantics) has already passed rank 0 and leaves it
    unmerged. apply_bpe must detect the anomaly and produce the scan's
    answer ["bc","d"], never the loop's ["bcd"]."""
    from victor_spark.operators.bpe import apply_bpe

    docs = spark.createDataFrame([(1, "bcd")], "doc_id long, text string")
    out = apply_bpe(docs, "text", [("bc", "d"), ("b", "c")]).first()
    assert list(out["bpe_tokens"]) == ["bc", "d"]
    # duplicate pairs are the other anomaly class: same fallback
    out2 = apply_bpe(
        docs, "text", [("b", "c"), ("c", "d"), ("b", "c")]
    ).first()
    assert list(out2["bpe_tokens"]) == ["bc", "d"]
    # and a clean table still rides the fast path to the same answers
    out3 = apply_bpe(docs, "text", [("b", "c"), ("bc", "d")]).first()
    assert list(out3["bpe_tokens"]) == ["bcd"]


def test_incremental_trainer_matches_recount_reference():
    """The round-11 incremental pair-count loop must choose exactly the
    merges (and record the pair counts) of a full recount per rank."""
    import random

    from victor_spark.operators.bpe import _train_merges_from_vocab

    def reference(vocab, num_merges):
        vocab = [(list(s), n) for s, n in vocab]
        merges = []
        for rank in range(1, num_merges + 1):
            counts = {}
            for syms, n in vocab:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (left, right), cnt = best
            merged = left + right
            merges.append((rank, left, right, merged, cnt))
            new_vocab = []
            for syms, n in vocab:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab.append((out, n))
            vocab = new_vocab
        return merges

    rng = random.Random(7)
    for trial in range(120):
        alpha = "abcd" if trial % 2 else "ab"
        vocab = [
            (
                list("".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))),
                rng.randint(1, 5),
            )
            for _ in range(rng.randint(1, 30))
        ]
        nm = rng.randint(1, 25)
        assert _train_merges_from_vocab(
            [(list(s), n) for s, n in vocab], nm
        ) == reference(vocab, nm)
    # edges: empty vocab, unmergeable single symbols, intra-word repeats
    assert _train_merges_from_vocab([], 5) == []
    assert _train_merges_from_vocab([(["a"], 3)], 5) == []
    v = [(list("ababab"), 2), (list("aaaa"), 1)]
    assert _train_merges_from_vocab(
        [(list(s), n) for s, n in v], 10
    ) == reference(v, 10)


def test_bpe_token_count_equals_apply_bpe_size(spark):
    """bpe_token_count must count exactly what apply_bpe segments —
    including NULL/empty text and passthrough of non-text columns."""
    from victor_spark.operators.bpe import bpe_token_count, train_bpe_merges

    m = train_bpe_merges(_corpus(spark), "text", num_merges=4).collect()
    merges = [(r["left"], r["right"]) for r in m]
    rows = [
        (1, "low lowest newer"),
        (2, ""),
        (3, None),
        (4, "WIDER wider  low"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    via_apply = {
        r["doc_id"]: len(r["bpe_tokens"])
        for r in apply_bpe(docs, "text", merges).collect()
    }
    via_count = {
        r["doc_id"]: r["n_bpe"]
        for r in bpe_token_count(docs, "text", merges).collect()
    }
    assert via_count == via_apply
    assert set(bpe_token_count(docs, "text", merges).columns) == {
        "doc_id",
        "n_bpe",
    }
