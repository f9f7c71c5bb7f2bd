"""Round-10 staged catalog queries — built and oracle-tested in round 9,
NOT yet registered.

Why staged (the round-8/9 pattern): the driver's correctness gate checks
the FIRST 50 of ``QUERIES`` and never-green queries auto-front. Round 9's
window is already exactly full (16 registered-this-round + 34 of the 43
r6-tier stale queries), so registering these now would evict stale-tier
queries from the window. They carry full builders, oracles, pytest parity
at BOTH the smoke SF and the driver's SF (tests/test_r10_pending.py), and
plan-shape assertions; tools/driver_sim.py --pending gives them a
vanilla-session path.

TO REGISTER AT ROUND-10 START: in ``catalog.py``, extend the round-9
registration line to also merge this module's ``PENDING`` (one line),
then update tests/test_r10_pending.py's registration test the way
test_r9_pending.py was updated at round-9 start.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from victor_spark.plans.catalog import (
    SQL_TOKS,
    QuerySpec,
    _lang_sql_parts,
)
from victor_spark.sources import load_table

PENDING: dict[str, QuerySpec] = {}


def _q10(name: str, oracle, doc: str = ""):
    def wrap(fn):
        PENDING[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return wrap


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring — the CCNet/KenLM perplexity
# filter's actual smoothing (the catalog's bigram_logprob is the
# unsmoothed member of the family)
# ---------------------------------------------------------------------------

_KN_D = 0.75

_KN_ORACLE = f"""
WITH d AS (SELECT doc_id, {SQL_TOKS.format(s='lower(text)')} t FROM documents),
bg AS (
  SELECT doc_id, unnest(t[1:len(t)-1]) w1,
         unnest(t[2:len(t)]) w2
  FROM d WHERE len(t) >= 2
),
bgc AS (SELECT w1, w2, count(*) c FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c) cw1, count(*) n1out FROM bgc GROUP BY w1),
cont AS (SELECT w2, count(*) n1in FROM bgc GROUP BY w2),
bt AS (SELECT count(*) b FROM bgc),
p AS (
  SELECT bgc.w1, bgc.w2,
         (greatest(CAST(bgc.c AS DOUBLE) - {_KN_D}, 0.0)
            / CAST(c1.cw1 AS DOUBLE))
         + (({_KN_D} * CAST(c1.n1out AS DOUBLE) / CAST(c1.cw1 AS DOUBLE))
            * (CAST(cont.n1in AS DOUBLE) / CAST(bt.b AS DOUBLE))) AS pkn
  FROM bgc JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN bt
),
per_doc AS (
  SELECT bg.doc_id, CAST(count(*) AS BIGINT) n_bigrams, avg(ln(p.pkn)) lp
  FROM bg JOIN p ON bg.w1 = p.w1 AND bg.w2 = p.w2
  GROUP BY bg.doc_id
)
SELECT d.doc_id,
       coalesce(per_doc.n_bigrams, 0) AS n_bigrams,
       round(coalesce(per_doc.lp, 0.0), 6) AS avg_kn_logp
FROM d LEFT JOIN per_doc USING (doc_id)
"""


@_q10(
    "kneser_ney_bigram",
    _KN_ORACLE,
    "interpolated Kneser-Ney bigram log-probability per doc (Kneser & "
    "Ney 1995; the smoothing KenLM ships and CCNet's perplexity filter "
    "actually uses — the catalog's bigram_logprob is the unsmoothed "
    "member): P(w2|w1) = max(c-D,0)/c(w1) + D*N1+(w1,.)/c(w1) * "
    "N1+(.,w2)/|bigram types|, D=0.75. Scale shape = the unigram/bigram "
    "LM family's: one explode, two Heaps-law-bounded type-table "
    "aggregations (map-side partial), the instance stream joins the "
    "scored type table on the bigram key, one per-doc aggregation; the "
    "bigram-type count is a 1-row broadcast. No new shuffle class at "
    "100 TB",
)
def q_kneser_ney_bigram(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("t"),
    )
    bg = d.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("_p"),
    ).select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    c1 = bgc.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count("*").alias("n1out")
    )
    cont = bgc.groupBy("w2").agg(F.count("*").alias("n1in"))
    bt = F.broadcast(bgc.agg(F.count("*").alias("b")))
    p = (
        bgc.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(bt)
        .select(
            "w1",
            "w2",
            (
                (
                    F.greatest(F.col("c").cast("double") - F.lit(_KN_D), F.lit(0.0))
                    / F.col("cw1").cast("double")
                )
                + (
                    (
                        F.lit(_KN_D)
                        * F.col("n1out").cast("double")
                        / F.col("cw1").cast("double")
                    )
                    * (F.col("n1in").cast("double") / F.col("b").cast("double"))
                )
            ).alias("pkn"),
        )
    )
    per_doc = (
        bg.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(F.log("pkn")).alias("lp"),
        )
    )
    return d.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.round(F.coalesce("lp", F.lit(0.0)), 6).alias("avg_kn_logp"),
    )


# ---------------------------------------------------------------------------
# Phrase search over posting lists — the inverted-index evaluation shape
# ---------------------------------------------------------------------------

_PHRASE = ("key", "order")

_PHRASE_ORACLE = f"""
WITH d AS (SELECT doc_id, {SQL_TOKS.format(s='text')} t FROM documents),
p AS (SELECT doc_id, generate_subscripts(t, 1) pos, unnest(t) tok FROM d),
a AS (SELECT doc_id, list_sort(list(pos)) pa FROM p
      WHERE tok = '{_PHRASE[0]}' GROUP BY doc_id),
b AS (SELECT doc_id, list(pos) pb FROM p
      WHERE tok = '{_PHRASE[1]}' GROUP BY doc_id),
m AS (SELECT a.doc_id, list_filter(pa, x -> list_contains(pb, x + 1)) mm
      FROM a JOIN b USING (doc_id))
SELECT doc_id, CAST(len(mm) AS INTEGER) AS n_matches,
       CAST(mm[1] AS INTEGER) AS first_pos
FROM m WHERE len(mm) > 0
"""


@_q10(
    "phrase_search",
    _PHRASE_ORACLE,
    f"exact phrase search ('{_PHRASE[0]} {_PHRASE[1]}') via posting-list "
    "intersection — the inverted-index evaluation shape: a lossless "
    "contains() prefilter drops non-candidate docs at the scan (a doc "
    "whose text lacks either substring cannot hold the token), the "
    "per-token filter runs map-side right after the explode, so the "
    "only thing that ever shuffles is the phrase terms' postings — "
    "document-frequency-bounded, never corpus-sized. One (doc, term) "
    "aggregation builds the sorted position lists; adjacency is a "
    "codegen intersection (positions of term1 whose successor holds "
    "term2). A hot stopword term is the known skew case and salts like "
    "any hot key. Returns matching docs with occurrence counts and the "
    "first match position",
)
def q_phrase_search(spark, sf_dir):
    from victor_spark.functions.vector import bind

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").contains(_PHRASE[0])
            & F.col("text").contains(_PHRASE[1])
        )
        .select(
            "doc_id",
            F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("t"),
        )
    )
    post = (
        d.select("doc_id", F.posexplode("t").alias("pos0", "tok"))
        .filter(F.col("tok").isin(*_PHRASE))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    pl = post.groupBy("doc_id", "tok").agg(
        F.sort_array(F.collect_list("pos")).alias("plist")
    )
    a = pl.filter(F.col("tok") == _PHRASE[0]).select(
        "doc_id", F.col("plist").alias("pa")
    )
    b = pl.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", F.col("plist").alias("pb")
    )
    matches = bind(
        F.filter(F.col("pa"), lambda x: F.array_contains(F.col("pb"), x + 1)),
        lambda mm: F.struct(
            # try_element_at: the struct is computed BEFORE the n>0
            # filter, and a doc holding both terms without adjacency has
            # an empty match array (element_at would throw)
            F.size(mm).alias("n"),
            F.try_element_at(mm, F.lit(1)).alias("fp"),
        ),
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", matches.alias("_m"))
        .filter(F.col("_m.n") > 0)
        .select(
            "doc_id",
            F.col("_m.n").alias("n_matches"),
            F.col("_m.fp").alias("first_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — the tokenizer-eval audit a
# multilingual pipeline runs before committing to a vocab
# ---------------------------------------------------------------------------


def _fertility_oracle(sf_dir: str) -> str:
    """Dynamic oracle: replay train+encode independently in Python (the
    bpe_encode oracle's pattern) to get per-doc BPE token counts, state
    them as VALUES, and restate language-ID + the per-language ratios in
    SQL — so the GROUPING and ratio arithmetic are still checked on the
    SQL side, not just copied from Spark."""
    import os

    import duckdb

    from victor_spark.plans.catalog import (
        _bpe_apply_merge,
        _expected_bpe_merges,
    )

    merge_pairs = [(a, b) for _r, a, b, _m, _n in _expected_bpe_merges(sf_dir)]
    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    ).fetchall()
    con.close()

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        for left, right in merge_pairs:
            syms = _bpe_apply_merge(syms, left, right)
        return syms

    rows = []
    for doc_id, text in docs:
        words = [w for w in (text or "").lower().split(" ") if w]
        n_bpe = sum(len(encode_word(w)) for w in words)
        rows.append((int(doc_id), n_bpe))
    values = ", ".join(f"({d}, {n})" for d, n in rows) or "(NULL, NULL)"
    selects, expr_lang, expr_score = _lang_sql_parts()
    return f"""
WITH enc(doc_id, n_bpe) AS (VALUES {values}),
d AS (SELECT doc_id, text, {SQL_TOKS.format(s='text')} t FROM documents),
ql AS (SELECT doc_id, CAST(len(t) AS BIGINT) n_words,
              CAST(length(text) AS BIGINT) n_chars,
              list_transform(t, x -> lower(x)) lt
       FROM d),
sc AS (SELECT doc_id, n_words, n_chars, {selects} FROM ql),
lp AS (SELECT doc_id, n_words, n_chars,
              (CASE WHEN {expr_score} > 0 THEN {expr_lang}
                    ELSE 'und' END) AS pred_lang
       FROM sc)
SELECT pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(enc.n_bpe) AS DOUBLE) / sum(lp.n_words), 6)
         AS fertility,
       round(CAST(sum(lp.n_chars) AS DOUBLE) / sum(enc.n_bpe), 6)
         AS chars_per_token
FROM lp JOIN enc USING (doc_id)
WHERE lp.n_words > 0
GROUP BY pred_lang
"""


@_q10(
    "tokenizer_fertility",
    _fertility_oracle,
    "tokenizer fertility audit by predicted language (the eval a "
    "multilingual pipeline runs before committing to a vocab — fertility "
    "= subword tokens per word; high-fertility languages get "
    "under-trained at a fixed token budget): language-ID and word/char "
    "counts are codegen projections, the BPE encode is the sanctioned "
    "Arrow farm (trained merges from the corpus itself, the bpe_train "
    "recurrence), and the audit is one tiny per-language aggregation. "
    "Oracle: an independent Python replay of train+encode states per-doc "
    "token counts as VALUES; language grouping and the ratio arithmetic "
    "are restated in SQL. Integer sums keep the ratios "
    "order-independent at any scale; word-free docs carry no fertility "
    "signal and are excluded in both engines",
)
def q_tokenizer_fertility(spark, sf_dir):
    from victor_spark.functions import text as T
    from victor_spark.operators.bpe import apply_bpe, train_bpe_merges

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [
        (r["left"], r["right"])
        for r in train_bpe_merges(d, "text", num_merges=20)
        .orderBy("rank")
        .collect()
    ]
    enc = apply_bpe(d, "text", merges)
    per_doc = enc.select(
        "doc_id",
        T.lang_id("text").alias("pred_lang"),
        T.token_count("text").cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        F.size("bpe_tokens").cast("long").alias("n_bpe"),
    )
    # word-free docs (empty/whitespace-only text) carry no fertility
    # signal and would make a group's sum(n_words)=0 divide by zero
    # under ANSI mode (review-caught) — excluded in BOTH engines
    per_doc = per_doc.filter(F.col("n_words") > 0)
    return per_doc.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
        ).alias("chars_per_token"),
    )
