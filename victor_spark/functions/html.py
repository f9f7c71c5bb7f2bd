"""Deterministic HTML -> text extraction — the boilerplate-strip stage
between WARC ingestion (``sources/warc.py``) and the documents-table
pipeline (C4 line filter, line/substring dedup, quality scoring).

Design constraints, in order:

1. **JVM-side.** The whole extraction is a chain of built-in
   ``regexp_replace`` / ``replace`` expressions — whole-stage codegen,
   zero Python, so at 100 TB it fuses with the WARC scan instead of
   adding an Arrow hop. (A browser-grade DOM parser would be a Pandas
   UDF; this is deliberately the deterministic-heuristic tier, like the
   n-gram language ID.)
2. **Oracle-replayable.** Every pattern is valid with identical
   semantics in BOTH regex engines the correctness gate runs (Java
   ``java.util.regex`` on the Spark side, RE2 in DuckDB): inline
   ``(?is)`` flags, ``\\b`` word boundaries, non-greedy ``.*?``, and
   ``\\x0B`` for vertical tab (never ``\\v`` — Java reads ``\\v`` as a
   vertical-WHITESPACE class, RE2 as the single char). ``\\s`` is
   avoided entirely after normalization starts, for the same reason.
3. **Order matters and is part of the contract**: containers first
   (script/style/head/comments — their CONTENT is not text), then block
   tags -> newline, then remaining tags -> '', then entity decode (last,
   so escaped markup in the source text survives as literal text — the
   behavior real extractors have), then whitespace normalization.

The extraction is a heuristic, not a browser: no CSS visibility, no
numeric character references beyond the named basics, no table layout.
That is the C4/CCNet tier this repo's downstream expects — deterministic,
cheap, and replayable, like ``pii_redact``'s regexes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- container elements whose CONTENT is dropped ---------------------------
RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
RE_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
RE_HEAD = r"(?is)<head\b[^>]*>.*?</head>"
RE_COMMENT = r"(?s)<!--.*?-->"

# -- block-level tags become line breaks (openers and closers both: the
#    extracted text gains at most an extra blank line, which the newline
#    run-collapse removes) ------------------------------------------------
RE_BLOCK = (
    r"(?i)</?(?:br|p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead"
    r"|tbody|tfoot|caption|blockquote|pre|hr|form|fieldset|legend|address"
    r"|article|aside|details|figcaption|figure|footer|header|main|nav"
    r"|section|summary|title|option|select|textarea)\b[^>]*>"
)

# -- every remaining tag (inline elements) vanishes without a break -------
RE_TAG = r"<[^>]*>"

# -- whitespace normalization (shared verbatim with the oracle SQL — the
#    four patterns the correctness gate replays in RE2) --------------------
RE_HWS = r"[ \t\r\f\x0B]+"  # horizontal whitespace runs -> one space
RE_NLPAD = r" *\n *"  # spaces hugging a newline -> bare newline
RE_NLRUN = r"\n+"  # newline runs (blank lines) -> one newline
RE_EDGE = r"^[ \n]+|[ \n]+$"  # leading/trailing whitespace -> ''

# entity decode order: ``&amp;`` strictly LAST, so double-escaped input
# (``&amp;lt;``) round-trips to the literal ``&lt;`` the author wrote
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def escape_html(col: Column) -> Column:
    """Minimal HTML escaping for embedding text as element content
    (``&`` first, then angle brackets — the inverse of the decode order
    in :func:`html_to_text`, so escape -> extract is the identity on the
    text, which is what makes the ``warc_extract`` oracle total)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def normalize_ws(col: Column) -> Column:
    """The whitespace half of the extraction contract: collapse
    horizontal runs, strip space around newlines, collapse blank lines,
    trim. Exposed separately because the oracle recomputes exactly this
    over the source text."""
    c = F.regexp_replace(col, RE_HWS, " ")
    c = F.regexp_replace(c, RE_NLPAD, "\n")
    c = F.regexp_replace(c, RE_NLRUN, "\n")
    return F.regexp_replace(c, RE_EDGE, "")


def sql_normalize_ws(expr: str) -> str:
    """DuckDB fragment computing :func:`normalize_ws` over ``expr`` —
    the SAME four patterns (module constants), so the two engines cannot
    drift apart silently."""
    c = f"regexp_replace({expr}, '{RE_HWS}', ' ', 'g')"
    c = f"regexp_replace({c}, '{RE_NLPAD}', chr(10), 'g')"
    c = f"regexp_replace({c}, '{RE_NLRUN}', chr(10), 'g')"
    return f"regexp_replace({c}, '{RE_EDGE}', '', 'g')"


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML string column. Deterministic
    heuristic (module docstring): drop script/style/head/comment content,
    break on block tags, strip inline tags, decode the named-entity
    basics, normalize whitespace. Pure built-in expressions — the plan
    stays in whole-stage codegen."""
    c = F.regexp_replace(col, RE_SCRIPT, "")
    c = F.regexp_replace(c, RE_STYLE, "")
    c = F.regexp_replace(c, RE_HEAD, "")
    c = F.regexp_replace(c, RE_COMMENT, "")
    c = F.regexp_replace(c, RE_BLOCK, "\n")
    c = F.regexp_replace(c, RE_TAG, "")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return normalize_ws(c)
