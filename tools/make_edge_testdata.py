"""Build an edge-case-rich VARIANT of the testdata and gate against it.

The driver regenerates /root/testdata between rounds, so every catalog
query must hold its Spark↔DuckDB parity on data it has never seen. This
tool manufactures the nastiest plausible regeneration: the sf0.001 tables
plus rows that sit exactly on the contracts' edges — empty and
whitespace-only documents, single-token and unicode and punctuation-only
text, giant tokens, midnight-boundary events, extreme values, tiny- and
huge-magnitude embeddings. Run the full gate against it:

    python tools/make_edge_testdata.py /tmp/testdata_edge
    python tools/driver_sim.py /tmp/testdata_edge

Any mismatch here is a robustness bug the next regeneration could expose
(this is how the dsir empty-target and unigram nd findings would have
been caught mechanically).

Numeric ranges stay inside the engine's documented parity contracts —
edges probe the contract boundary, not IEEE pathology beyond it:

- no zero vectors: the cosine contract scores them NaN on Spark while
  DuckDB's x/0 is NULL (documented cross-engine caveat; the generator
  never emits them);
- |event value| <= ~9e7: the decimal-exact-sum trick (DECIMAL(24,8))
  relies on DuckDB's double->decimal cast being exact, which holds only
  while value*10^8 fits double's 53-bit mantissa — Spark's BigDecimal
  cast is exact everywhere, so beyond that bound the ENGINES diverge on
  the cast itself;
- embedding norms <= ~1e8: embedding_stats sums norms as DECIMAL(20,12)
  (8 integral digits), and PCA's Gram conditioning assumes vectors
  within a few orders of magnitude of unit scale.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (9001, "", "en", "edge"),
    (9002, "   ", "en", "edge"),
    (9003, "one", "en", "edge"),
    (9004, "x " * 500, "de", "edge"),                      # long, 1-char tokens
    (9005, "a" * 2000, "fr", "edge"),                       # one giant token
    (9006, "héllo wörld ünïcode tæxt ßharp", "de", "edge"),
    (9007, "!!! ??? ... ,,, ;;; :::", "en", "edge"),        # punctuation-only
    (9008, "the the the the the the the the", "en", "edge"),  # max repetition
    (9009, "Tab\tand\nnewline separated words", "en", "edge"),
    (9010, "mixed 123 numbers 456 and WORDS", "es", "edge"),
    (9011, "back\\slash c:\\path\\to and quote's", "en", "edge"),
]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_edge"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
        )

    docs_values = ", ".join(
        "(%d, %s, '%s', '%s')" % (i, _sql_str(txt), lang, srcname)
        for i, txt, lang, srcname in EDGE_DOCS
    )
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang, source, n_chars
          FROM '{SRC}/documents.parquet'
          UNION ALL
          SELECT doc_id, text, lang, source, CAST(len(text) AS BIGINT)
          FROM (VALUES {docs_values}) v(doc_id, text, lang, source)
        ) TO '{out}/documents.parquet'
    """)

    # events: midnight-exact timestamps, extreme values, a brand-new type
    con.execute(f"""
        COPY (
          SELECT * FROM '{SRC}/events.parquet'
          UNION ALL
          SELECT * FROM (VALUES
            (900001, TIMESTAMP '2024-03-01 00:00:00', 1, 'view', 0.0, '{{}}'),
            (900002, TIMESTAMP '2024-03-01 23:59:59.999999', 1, 'click', -1e6, '{{}}'),
            (900003, TIMESTAMP '2024-03-02 00:00:00', 2, 'purchase', 1e6, '{{"k": "v"}}'),
            (900004, TIMESTAMP '2024-02-29 12:00:00', 3, 'edge_type', 0.000001, NULL)
          ) v(event_id, ts, user_id, event_type, value, props)
        ) TO '{out}/events.parquet'
    """)

    # embeddings: tiny and huge magnitudes (still far from underflow),
    # a near-duplicate of vec 0, all 64-dim like the source
    con.execute(f"""
        COPY (
          SELECT * FROM '{SRC}/embeddings.parquet'
          UNION ALL
          SELECT 9001, CAST(list_transform(range(64), i -> 1e-6 * (i + 1)) AS FLOAT[]), 0
          UNION ALL
          SELECT 9002, CAST(list_transform(range(64), i -> 1e3 * (i + 1)) AS FLOAT[]), 1
          UNION ALL
          SELECT 9003, CAST((SELECT list_transform(embedding, x -> x * 1.0001)
                             FROM '{SRC}/embeddings.parquet' WHERE vec_id = 0) AS FLOAT[]), 2
        ) TO '{out}/embeddings.parquet'
    """)

    print(f"edge testdata written to {out}")
    return 0


def _sql_str(s: str) -> str:
    # standard SQL literal: only quotes double; backslash is LITERAL in
    # DuckDB's default string syntax (doubling it would corrupt the text)
    return "'" + s.replace("'", "''") + "'"


if __name__ == "__main__":
    raise SystemExit(main())
