"""Unigram-LM (SentencePiece-style) subword tokenizer training — the BPE
family's sibling and the tokenizer most modern LLMs actually ship
(Kudo 2018, "Subword Regularization"; the SentencePiece `--model_type=
unigram` default). Trains by hard (Viterbi) EM, the deterministic member
of the EM family: every expected count is an INTEGER sum of word
frequencies, so the distributed E-step is partition-order independent
and the whole trainer is a pure function of the corpus.

Industrial shape at 100 TB (deliberately different from BPE's, because
the bottleneck moves): BPE's merge loop is O(vocab) per merge and runs
fine on the collected vocabulary, but unigram-EM's E-step must Viterbi-
segment EVERY word type against the current piece table each iteration —
at web scale the type table (Heaps' law, ~corpus^0.5) can exceed driver
memory, so the E-step here is DISTRIBUTED: an Arrow-batched mapInPandas
over the (word, n) type table with the current piece table in the
closure, emitting per-batch partial (piece, count) rows that one
Heaps-bounded groupBy folds. Only the vocab-sized count table is ever
collected; the M-step (re-estimate + prune) is a deterministic driver
fold over it. Corpus text is touched exactly once (the word count);
every EM pass rides the type table.

Determinism contract (what the dynamic oracle replays):
- seeding: top ``max_vocab`` word types by (count desc, word asc);
  candidate substrings occurrence-counted and weighted by word
  frequency; all single characters kept + top multi-char substrings by
  (count desc, piece asc);
- Viterbi: positions left to right, candidate piece lengths ascending,
  STRICT improvement — ties go to the shortest final piece; unreachable
  positions fall back to a single-character <unk> step with logp
  ``UNK_LOGP`` (unk steps are emitted as tokens but never counted);
- M-step: add-alpha smoothing (alpha=0.1) over the kept pieces;
- pruning after every M-step: all single-char pieces survive (coverage),
  multi-char pieces keep the top slots by (count desc, piece asc).

Reference scope note: the reference engine (/root/reference, a Rust
vector DB) has no tokenizer; this operator is part of the LLM-data-
pipeline surface the build brief adds on top (SURVEY.md §2 extension
table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victor_spark.operators.bpe import word_counts

UNK_LOGP = -100.0
_ALPHA = 0.1


def _smooth_logps(counts: dict[str, int]) -> dict[str, float]:
    """Add-alpha log-probabilities over a piece-count table. Plain
    Python floats in a deterministic order (sorted pieces) so the Spark
    trainer and the oracle replay produce bit-identical values."""
    total = sum(counts.values())
    denom = total + _ALPHA * len(counts)
    return {
        p: math.log((counts[p] + _ALPHA) / denom) for p in sorted(counts)
    }


def viterbi_segment(
    word: str, logps: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under the piece table — the exact
    DP both the distributed E-step and the oracle replay run. Strict
    improvement + ascending piece length = deterministic tie-break;
    unreachable positions take a single-char <unk> step (emitted, never
    counted)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for length in range(1, min(i, max_piece_len) + 1):
            lp = logps.get(word[i - length : i])
            if lp is None:
                continue
            s = best[i - length] + lp
            if s > best[i]:
                best[i] = s
                back[i] = length
        if best[i] == -math.inf:
            best[i] = best[i - 1] + UNK_LOGP
            back[i] = 1
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def _seed_pieces(
    vocab: list[tuple[str, int]], seed_max_len: int, seed_size: int,
    seed_whole_words: bool = False,
) -> dict[str, int]:
    """Deterministic seed-candidate table: every substring up to
    ``seed_max_len`` of every word type, occurrence-counted weighted by
    the word's corpus frequency; all single characters survive, the
    multi-char tail keeps the top (count desc, piece asc) slots.
    ``seed_whole_words`` additionally admits every full word type as a
    candidate regardless of ``seed_max_len`` (SentencePiece's behavior
    — without it a frequent word LONGER than seed_max_len can never
    become a single piece, which floors its fertility above 1; the
    matched-vocab head-to-head in SCALING.md caught this)."""
    cand: dict[str, int] = {}
    for word, n in vocab:
        wl = len(word)
        for length in range(1, min(seed_max_len, wl) + 1):
            for start in range(wl - length + 1):
                sub = word[start : start + length]
                cand[sub] = cand.get(sub, 0) + n
        if seed_whole_words and wl > seed_max_len:
            cand[word] = cand.get(word, 0) + n
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(seed_size - len(chars), 0)]
    out = dict(chars)
    out.update(multi)
    return out


def _seed_pieces_df(
    top: DataFrame, seed_max_len: int, seed_size: int,
    seed_whole_words: bool = False,
) -> dict[str, int]:
    """Distributed twin of :func:`_seed_pieces` over the (word, n) type
    DataFrame — BIT-IDENTICAL output by construction: substring counts
    are exact integer sums (order-independent), and the survivor
    selection is the same total order ((count desc, piece asc); all
    single chars always survive). The round-10 verdict's watch item was
    the driver-side candidate dict — at the 1M-type ``max_vocab``
    default with seed_max_len=5 it can reach tens of millions of
    entries BEFORE the seed_size cut. Here the candidate table never
    exists anywhere whole: substrings explode map-side, one
    Heaps-bounded shuffle sums them, and the only collects are the
    alphabet-sized char set and the seed_size-bounded TakeOrdered
    survivors."""
    wl = F.length("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(seed_max_len), wl)),
            lambda ln: F.transform(
                F.sequence(F.lit(1), wl - ln + 1),
                lambda s: F.col("word").substr(s, ln),
            ),
        )
    )
    if seed_whole_words:
        subs = F.concat(
            subs,
            F.when(wl > seed_max_len, F.array(F.col("word"))).otherwise(
                F.array().cast("array<string>")
            ),
        )
    # NOTE (round-11): a lazy localCheckpoint reuse barrier here was
    # tried and REVERTED — matched A/B wall-timing showed +35% on
    # unigram_lm_train: Spark's exchange reuse already shares the
    # aggregation between the two collects, so the barrier only added a
    # materialization and disabled AQE below it.
    counts = (
        top.select(F.explode(subs).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("c"))
    )
    chars = {
        str(r["piece"]): int(r["c"])
        for r in counts.filter(F.length("piece") == 1).collect()
    }
    k = max(seed_size - len(chars), 0)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(k)
        .collect()
    )
    out = dict(sorted(chars.items()))
    out.update((str(r["piece"]), int(r["c"])) for r in multi)
    return out


def _prune(counts: dict[str, int], vocab_size: int) -> dict[str, int]:
    """Coverage-preserving prune: single chars always survive; multi-char
    pieces keep the top (count desc, piece asc) slots up to
    ``vocab_size`` total."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(vocab_size - len(chars), 0)]
    out = dict(chars)
    out.update(multi)
    return out


def _estep_counts(
    wc: DataFrame, logps: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """ONE distributed Viterbi E-step over the (word, n) type table:
    per-batch partial Counter folds inside the Arrow farm, one
    Heaps-bounded shuffle sums them, and only the vocab-sized result is
    collected. Integer counts -> partition-order independent."""
    table = dict(logps)  # plain dict: picklable, closure-shipped once

    def _count(batches):
        import pandas as pd

        agg: dict[str, int] = {}
        for pdf in batches:
            for word, n in zip(pdf["word"], pdf["n"]):
                for piece in viterbi_segment(str(word), table, max_piece_len):
                    if piece in table:
                        agg[piece] = agg.get(piece, 0) + int(n)
        if agg:
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "c": list(agg.values())}
            )

    parts = wc.mapInPandas(_count, schema="piece string, c long")
    rows = parts.groupBy("piece").agg(F.sum("c").alias("c")).collect()
    return {r["piece"]: int(r["c"]) for r in rows}


def train_unigram(
    docs: DataFrame,
    text_col: str,
    vocab_size: int = 300,
    seed_max_len: int = 5,
    seed_size: int = 1000,
    em_iters: int = 3,
    max_vocab: int = 1_000_000,
    seed_whole_words: bool = False,
) -> DataFrame:
    """Train a unigram-LM piece table; returns (piece, expected_n, logp).

    ``expected_n`` is the final E-step's integer Viterbi count;
    ``logp`` the smoothed log-probability the encode leg uses. Both are
    driver-computed Python floats shipped via createDataFrame, so the
    values are bit-exact against an independent replay of the same
    recurrence (no engine math in the output path). ``max_vocab`` bounds
    which word types PARTICIPATE in seeding (top types by count — the
    same cap and justification as BPE training); seeding itself runs
    distributed with no type-table or candidate-table collect (see
    :func:`_seed_pieces_df` — bit-identical to the driver reference
    :func:`_seed_pieces`), and every E-step runs distributed over the
    full type table. ``seed_whole_words=True`` admits full word
    types into the seed beyond ``seed_max_len`` (the SentencePiece
    default behavior); it is opt-in so every artifact gated on the
    default parameters stays bit-identical.
    """
    if vocab_size < 1 or em_iters < 1:
        raise ValueError(
            f"train_unigram: vocab_size/em_iters must be >= 1, got "
            f"{vocab_size}/{em_iters}"
        )
    wc = word_counts(docs, text_col).localCheckpoint(eager=False)
    # seeding participation is capped at the top max_vocab word types
    # (the same cap/justification as BPE), but the type table itself
    # never collects: seeding runs distributed and only the
    # seed_size-bounded survivor table reaches the driver (the round-10
    # verdict's watch item — the old driver-side candidate dict could
    # hit tens of millions of entries at the 1M-type default).
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(max_vocab)
    counts = _seed_pieces_df(top, seed_max_len, seed_size,
                             seed_whole_words=seed_whole_words)
    if not counts:
        return docs.sparkSession.createDataFrame(
            [], "piece string, expected_n long, logp double"
        )
    max_piece_len = max(len(p) for p in counts)
    # NO pre-EM prune: the full seed rides into the first E-step so the
    # prune decisions are EM-informed (Viterbi-count) facts, never raw
    # substring-frequency ties — an upfront prune to vocab_size evicted
    # whole frequent words on lexicographic tie-break (test-caught).
    # The seed table is seed_size-bounded, so the closure stays small.
    for _ in range(em_iters):
        logps = _smooth_logps(counts)
        stepped = _estep_counts(wc, logps, max_piece_len)
        # unused pieces drop to count 0 (they still held smoothed mass
        # this round); the prune keeps chars + the strongest survivors
        counts = _prune(
            {p: stepped.get(p, 0) for p in counts}, vocab_size
        )
    logps = _smooth_logps(counts)
    rows = [(p, counts[p], logps[p]) for p in sorted(counts)]
    return docs.sparkSession.createDataFrame(
        rows, "piece string, expected_n long, logp double"
    )


def apply_unigram(
    docs: DataFrame,
    text_col: str,
    logps: dict[str, float],
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Viterbi-encode each doc's words with a trained piece table —
    Arrow-batched mapInPandas, the serving path's exact DP (unreachable
    characters come out as single-char <unk> tokens, same as training).
    Appends ``out_col array<string>``."""
    import pandas as pd

    table = dict(logps)
    max_piece_len = max((len(p) for p in table), default=1)

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{fields}, {out_col} array<string>"

    def _encode(batches):
        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            r = cache.get(w)
            if r is None:
                if len(cache) >= (1 << 17):
                    cache.clear()
                r = viterbi_segment(w, table, max_piece_len)
                cache[w] = r
            return r

        for pdf in batches:
            toks = [
                [
                    s
                    for w in ("" if t is None else str(t)).lower().split(" ")
                    if w
                    for s in enc(w)
                ]
                for t in pdf[text_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    return docs.mapInPandas(_encode, schema=schema)


def unigram_token_count(
    docs: DataFrame,
    text_col: str,
    logps: dict[str, float],
    out_col: str = "n_unigram",
) -> DataFrame:
    """Per-row unigram-LM token COUNT — same Viterbi segmentation as
    :func:`apply_unigram` (identical DP, identical word cache), but the
    farm returns one long per row instead of the full piece array, and
    the text column is consumed inside Python rather than shipped back.
    For count-consuming queries (fertility audits) this removes the
    Python->JVM token-array transfer AND the text round-trip (the
    bpe_token_count treatment, guide §4.1 "pass only the columns the
    function needs" — in both directions). All non-text columns pass
    through untouched."""
    import pandas as pd

    table = dict(logps)
    max_piece_len = max((len(p) for p in table), default=1)

    keep = [f for f in docs.schema.fields if f.name != text_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    schema = f"{fields}, {out_col} bigint" if fields else f"{out_col} bigint"
    keep_names = [f.name for f in keep]

    def _count(batches):
        cache: dict[str, int] = {}

        def cnt(w: str) -> int:
            r = cache.get(w)
            if r is None:
                if len(cache) >= (1 << 17):
                    cache.clear()
                r = len(viterbi_segment(w, table, max_piece_len))
                cache[w] = r
            return r

        for pdf in batches:
            counts = [
                sum(
                    cnt(w)
                    for w in ("" if t is None else str(t)).lower().split(" ")
                    if w
                )
                for t in pdf[text_col]
            ]
            out = pdf[keep_names].copy()
            out[out_col] = pd.Series(counts, index=pdf.index, dtype="int64")
            yield out

    return docs.mapInPandas(_count, schema=schema)
