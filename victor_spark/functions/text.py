"""Text-analysis column functions for the LLM-data-pipeline extension ops.

All native Column expressions (regexp/length/array fns) — these run inside
whole-stage codegen over the `documents` table and scale linearly with a
100 TB text corpus; there is no Python in any of these paths.

Regex patterns are kept in the common subset of Java regex (Spark) and RE2
(DuckDB oracle) — character classes and + quantifiers only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from victor_spark.functions.vector import (
    _col,
    _is_simple_name,  # noqa: F401 — canonical impl lives in vector.py
    bind,
    ColumnOrName,
)

# Tiny per-language marker-word lists for the n-gram/stopword language-ID
# heuristic. Deterministic and oracle-expressible; real deployments would
# swap in fastText/CLD3 behind the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

WORD_RE = "[A-Za-z0-9]+"
PUNCT_RE = "[^A-Za-z0-9 ]"


def _tokens_sql(ref: str) -> str:
    """SQL source of tokens() over a pre-rendered operand (backticked
    name or embedded expression) — the same string _quality_score_sql
    and _lang_id_sql inline."""
    return f"filter(split({ref}, ' '), _t -> _t != '')"


def tokens(s: ColumnOrName) -> Column:
    """Whitespace tokens (empties removed) — array<string>.

    Column NAMES take a one-parsed-SQL fast path (round-12, guide §7.3
    — ~130 py4j round trips on the builder path, and tokens() is the
    most-called builder in the catalog); Column inputs keep the builder.
    """
    if _is_simple_name(s):
        return F.expr(_tokens_sql(f"`{s}`"))
    return F.filter(F.split(_col(s), " "), lambda t: t != "")


def token_count(s: ColumnOrName) -> Column:
    """Whitespace token count."""
    if _is_simple_name(s):
        return F.expr(f"size({_tokens_sql(f'`{s}`')})")
    return F.size(tokens(s))


def term_counts(t: ColumnOrName) -> Column:
    """Distinct-term counts of a token array, computed ROW-LOCALLY:
    array<struct<tok:string, c:bigint>> — one struct per distinct token
    with its occurrence count, via a sorted-run scan (array_sort + run
    boundaries). Exactly the multiset an explode + groupBy(doc, tok)
    count produces, without the corpus-token-sized exchange: per-doc
    term statistics are intra-row data, so at 100 TB this turns the
    counting stage of TF-IDF/BM25-style scorers into a pure map.
    Integer arithmetic throughout — bit-identical to the grouped form.
    NULL/empty arrays yield an empty result (the rows explode() would
    simply drop)."""
    t = _col(t)

    # Both the sorted array and the run-start index array are routed
    # through bind() so each evaluates ONCE per row. Referencing the
    # array_sort expression directly inside the index lambdas re-ran the
    # whole sort per ELEMENT (HOF lambdas interpret their captured
    # subtrees per call — the O(n²) hazard bind() exists for), which
    # round-11 wall-timing caught as a 20x regression on long docs.
    def _with_sorted(s: Column) -> Column:
        n = F.size(s)
        # run starts: position 1, and every i where s[i] != s[i-1]
        # (greatest(i-1, 1) keeps the i=1 probe in bounds under ANSI;
        # its self-compare is false and the i==1 arm admits the
        # position). The index array is guarded BEFORE the filter:
        # bind() evaluates its argument eagerly, and sequence(1, 0)
        # descends to [1, 0] whose 0 index would trip ANSI element_at
        # on empty/NULL arrays (the old form only ever evaluated these
        # under the n >= 1 branch).
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )
        starts_expr = F.filter(
            idx,
            lambda i: (i == 1)
            | (
                F.element_at(s, i)
                != F.element_at(s, F.greatest(i - 1, F.lit(1)))
            ),
        )

        def _with_starts(starts: Column) -> Column:
            m = F.size(starts)
            counted = F.transform(
                F.sequence(F.lit(1), m),
                lambda j: F.struct(
                    F.element_at(s, F.element_at(starts, j)).alias("tok"),
                    (
                        F.coalesce(
                            F.when(j < m, F.element_at(starts, j + 1)), n + 1
                        )
                        - F.element_at(starts, j)
                    )
                    .cast("long")
                    .alias("c"),
                ),
            )
            return F.when(n >= 1, counted).otherwise(
                F.array().cast("array<struct<tok:string,c:bigint>>")
            )

        return bind(starts_expr, _with_starts)

    return bind(F.array_sort(t), _with_sorted)


def c4_kept_lines(lines: Column) -> Column:
    """The C4 line-filter predicate (Raffel 2020 §2.2) over an
    ``array<string>`` of lines: keep lines with >= 3 whitespace tokens
    ending in terminal punctuation (``. ! ?`` or their close-quote
    forms — colons are boilerplate and dropped). ONE definition shared
    by the batch catalog queries (c4_line_filter, crawl_pipeline) and
    the streaming curation topology, so the C4 contract cannot drift
    between planes; the DuckDB oracles restate it literally."""
    return F.filter(
        lines,
        lambda l: (token_count(l) >= 3)
        & (
            l.endswith(".")
            | l.endswith("!")
            | l.endswith("?")
            | l.endswith('."')
            | l.endswith('!"')
            | l.endswith('?"')
        ),
    )


def word_count(s: ColumnOrName) -> Column:
    """Count of [A-Za-z0-9]+ word tokens (BPE-ish pre-tokenizer count)."""
    return F.size(F.regexp_extract_all(_col(s), F.lit(WORD_RE), 0))


def char_count(s: ColumnOrName) -> Column:
    return F.length(_col(s))


def avg_token_len(s: ColumnOrName) -> Column:
    """Mean token length in characters; 0 for empty docs."""
    return bind(
        tokens(s),
        lambda t: F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            F.aggregate(t, F.lit(0.0), lambda a, x: a + F.length(x)) / F.size(t)
        ),
    )


def punct_ratio(s: ColumnOrName) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    s = _col(s)
    n = F.length(s)
    punct = F.size(F.regexp_extract_all(s, F.lit(PUNCT_RE), 0))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(s: ColumnOrName) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    def _ratio(t: Column) -> Column:
        hits = F.size(
            F.filter(t, lambda x: F.lower(x).isin(*[F.lit(w) for w in STOPWORDS]))
        )
        return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            hits.cast("double") / F.size(t)
        )

    return bind(tokens(s), _ratio)


# _is_simple_name is imported from vector.py (one canonical guard for
# every SQL fast path in the repo).

# The SQL fast paths below interpolate these constants into single-quoted
# SQL literals verbatim. A future word with an apostrophe ("don't") or a
# regex with a quote/backslash would break the F.expr parse or silently
# diverge from the builder path — fail loudly at import time instead
# (round-11 advice item).
assert all(
    "'" not in w and "\\" not in w
    for words in LANG_MARKERS.values()
    for w in words
), "LANG_MARKERS words must be quote/backslash-free (SQL fast path)"
assert all(
    "'" not in w and "\\" not in w for w in STOPWORDS
), "STOPWORDS must be quote/backslash-free (SQL fast path)"
assert "'" not in PUNCT_RE and "\\" not in PUNCT_RE, (
    "PUNCT_RE must be quote/backslash-free (SQL fast path)"
)

_STOPWORD_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def _quality_score_sql(s: str) -> str:
    """One-parsed-SQL twin of quality_score's builder tree (round-11,
    guide §7.3 — the hashing-kernel precedent): same bind() structure,
    same duplicated subtrees, double literals suffixed D so no decimal
    types sneak in. Pinned == builder by tests/test_text.py."""
    toks = f"filter(split(`{s}`, ' '), _t -> _t != '')"
    pr = (
        f"CASE WHEN length(`{s}`) = 0 THEN 0.0D "
        f"ELSE CAST(size(regexp_extract_all(`{s}`, '{PUNCT_RE}', 0)) AS DOUBLE)"
        f" / length(`{s}`) END"
    )
    atl = (
        "CASE WHEN size(_t) = 0 THEN 0.0D "
        "ELSE aggregate(_t, 0.0D, (a, x) -> a + length(x)) / size(_t) END"
    )
    hits = f"size(filter(_t, _x -> lower(_x) IN {_STOPWORD_IN}))"
    sr = (
        f"CASE WHEN size(_t) = 0 THEN 0.0D "
        f"ELSE CAST({hits} AS DOUBLE) / size(_t) END"
    )
    len_ok = "least(CAST(size(_t) AS DOUBLE) / 50.0D, 1.0D)"
    tok_ok = f"CASE WHEN ({atl}) >= 3.0D AND ({atl}) <= 10.0D THEN 1.0D ELSE 0.5D END"
    punct_ok = f"CASE WHEN ({pr}) <= 0.2D THEN 1.0D ELSE 0.5D END"
    stop_ok = f"least(({sr}) * 10.0D, 1.0D)"
    body = f"((({len_ok}) + ({tok_ok}) + ({punct_ok}) + ({stop_ok})) / 4.0D)"
    return f"get(transform(array({toks}), _t -> {body}), 0)"


def quality_score(s: ColumnOrName) -> Column:
    """Heuristic document quality in [0, 1].

    Combines length sufficiency, reasonable mean token length, punctuation
    sanity and stopword presence — the standard cheap pre-filter stack for
    pretraining-data curation (C4/Gopher-style rules).

    Column NAMES take a one-parsed-SQL fast path (~1.2k py4j round trips
    on the builder path); Column inputs keep the builder.
    """
    if _is_simple_name(s):
        return F.expr(_quality_score_sql(s))
    pr = punct_ratio(s)

    def _score(t: Column) -> Column:
        n_tok = F.size(t).cast("double")
        atl = F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            F.aggregate(t, F.lit(0.0), lambda a, x: a + F.length(x)) / F.size(t)
        )
        hits = F.size(
            F.filter(t, lambda x: F.lower(x).isin(*[F.lit(w) for w in STOPWORDS]))
        )
        sr = F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
            hits.cast("double") / F.size(t)
        )
        len_ok = F.least(n_tok / F.lit(50.0), F.lit(1.0))
        tok_ok = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
        punct_ok = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
        stop_ok = F.least(sr * F.lit(10.0), F.lit(1.0))
        return (len_ok + tok_ok + punct_ok + stop_ok) / F.lit(4.0)

    return bind(tokens(s), _score)


def _in_markers(markers: tuple[str, ...]):
    return lambda x: x.isin(*[F.lit(w) for w in markers])


def _marker_counts(t: Column) -> Column:
    """array<int> of marker-word hits per language (LANG_MARKERS order)
    over a bound lowercased-token variable."""
    return F.array(
        *[F.size(F.filter(t, _in_markers(m))) for m in LANG_MARKERS.values()]
    )


def lang_scores(s: ColumnOrName) -> dict[str, Column]:
    """Marker-word hit count per language over the lowercased tokens."""
    counts = bind(
        bind(tokens(s), lambda t: F.transform(t, F.lower)), _marker_counts
    )
    return {
        lang: F.get(counts, i) for i, lang in enumerate(LANG_MARKERS)
    }


def _lang_id_sql(s: str) -> str:
    """One-parsed-SQL twin of lang_id's builder tree: the same nested
    binds and the same unrolled argmax when-chains (generated by the
    same loop, so the chain structure cannot drift). Pinned == builder
    by tests/test_text.py."""
    toks = f"filter(split(`{s}`, ' '), _t -> _t != '')"
    lowered = f"get(transform(array({toks}), _t -> transform(_t, _x -> lower(_x))), 0)"
    counts = ", ".join(
        "size(filter(_lt, _x -> _x IN ("
        + ", ".join(f"'{w}'" for w in m)
        + ")))"
        for m in LANG_MARKERS.values()
    )
    scores = (
        f"get(transform(array({lowered}), _lt -> array({counts})), 0)"
    )
    langs = list(LANG_MARKERS)
    best_lang = f"'{langs[0]}'"
    best_score = "get(_sc, 0)"
    for i, lang in enumerate(langs[1:], start=1):
        cond = f"get(_sc, {i}) > ({best_score})"
        best_lang = f"CASE WHEN {cond} THEN '{lang}' ELSE {best_lang} END"
        best_score = f"CASE WHEN {cond} THEN get(_sc, {i}) ELSE ({best_score}) END"
    body = f"CASE WHEN ({best_score}) > 0 THEN {best_lang} ELSE 'und' END"
    return f"get(transform(array({scores}), _sc -> {body}), 0)"


def lang_id(s: ColumnOrName) -> Column:
    """Predicted language = argmax marker count; 'und' if all zero.

    Ties break by the fixed language order en>de>fr>es>zh (strictly-greater
    comparison), identically in the SQL oracle.

    The argmax when-chain references each score several times; scores are
    bound (see ``bind``) so each reference is a slot read, not a fresh
    token-scan — the naive composition is exponential in chain depth.

    Column NAMES take a one-parsed-SQL fast path (~1.5k py4j round trips
    on the builder path); Column inputs keep the builder.
    """
    if _is_simple_name(s):
        return F.expr(_lang_id_sql(s))
    lowered = bind(tokens(s), lambda t: F.transform(t, F.lower))

    def _argmax(sc: Column) -> Column:
        langs = list(LANG_MARKERS)
        best_lang = F.lit(langs[0])
        best_score = F.get(sc, 0)
        for i, lang in enumerate(langs[1:], start=1):
            cond = F.get(sc, i) > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, F.get(sc, i)).otherwise(best_score)
        return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))

    return bind(bind(lowered, _marker_counts), _argmax)


def fingerprint64(s: ColumnOrName) -> Column:
    """Deterministic document fingerprint: min 32-bit hash over 8-gram
    character shingles (winnowing-style min-sampling, Schleimer et al. 2003).

    Equal fingerprints ⇒ likely shared content; used for cheap containment
    checks. Oracle-expressible via the shared md5-based hash.
    """
    from victor_spark.functions.hashing import shingle_hashes

    return F.coalesce(F.array_min(shingle_hashes(s, 8)), F.lit(0).cast("long"))
