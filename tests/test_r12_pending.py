"""Round-12 staged queries (plans/catalog_r12.py): the instruction/SFT
data-prep family — full driver-gate parity NOW, registration at
round-12 start. These tests run the exact compare the driver gate runs,
at BOTH the smoke SF and the gate's own SF, plus the family's
plan-shape and offset-arithmetic pins.

Registration-test discipline (test_gate_order.py lint): nothing here
references the CORRECTNESS artifacts — the staging test below flips to
the spec-identity form at registration, never to a never-green claim."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE, SF_T2
from tests.oracle_utils import compare, duck_connect
from victor_spark.plans import QUERIES
from victor_spark.plans.catalog_r12 import (
    _C1_CONST,
    _C3_CONST,
    _SYS,
    PENDING,
)


def test_r12_pending_queries_are_not_registered():
    """Staging invariant: nothing here may leak into the live registry
    (it would evict rotation-tier queries from the round-11 gate
    window). Flipped to the spec-identity form at round-12 start."""
    assert PENDING
    assert not set(PENDING) & set(QUERIES)
    for name, spec in PENDING.items():
        sql = spec.oracle_sql(SF_SMOKE)
        assert sql and "SELECT" in sql.upper(), name


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_T2])
@pytest.mark.parametrize("name", sorted(PENDING))
def test_r12_pending_query_matches_oracle(spark, name, sf):
    spec = PENDING[name]
    con = duck_connect(sf)
    sdf = spec.build(spark, sf)
    odf = con.execute(spec.oracle_sql(sf)).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


# ---------------------------------------------------------------------------
# plan-shape assertions: the family's scale claims
# ---------------------------------------------------------------------------


def _plan(spark, name: str) -> str:
    df = PENDING[name].build(spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_render_is_one_scan_zero_shuffles(spark):
    # conversation assembly is a pure per-row projection: no Exchange of
    # ANY kind, no Generate, no Python — at 100 TB it costs one corpus
    # scan, exactly like fim_transform
    p = _plan(spark, "sft_render_conversations")
    assert "Exchange" not in p
    assert "Generate" not in p
    assert "EvalPython" not in p and "MapInPandas" not in p


def test_loss_mask_is_zero_shuffle_one_explode(spark):
    # span arithmetic is pure length/substring codegen; the only plan
    # node beyond the projection is the bounded 2-element span explode
    import re

    p = _plan(spark, "sft_loss_mask_spans")
    assert "Exchange" not in p
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1
    assert "EvalPython" not in p and "MapInPandas" not in p


def test_screen_adds_zero_corpus_shuffles(spark):
    # the contamination_check shape: the ONLY exchanges are the tiny
    # bench side's SinglePartition collect_set and its broadcast — the
    # conversation corpus never hash-partitions, and the top-20 is a
    # bounded heap. (Formatted explain puts the partitioning spec on an
    # Arguments: line, so the check greps the bare "hashpartitioning"
    # token — "Exchange hashpartitioning" never matches formatted mode.)
    p = _plan(spark, "sft_contamination_screen")
    assert "hashpartitioning" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "TakeOrderedAndProject" in p


def test_pack_shuffles_once_by_bucket_only(spark):
    # the pack_sequences shape: EXACTLY one hash exchange (by bucket —
    # never a global unpartitioned cumsum), per-bucket windows, no
    # Python anywhere
    import re

    p = _plan(spark, "sft_pack_conversations")
    assert len(re.findall(r"hashpartitioning\(bucket", p)) == 1
    assert len(re.findall(r"hashpartitioning", p)) == 1
    assert "Window" in p
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# behavioral pins: offset arithmetic, planted contamination, NULL text
# ---------------------------------------------------------------------------


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet")
    )


def _render_py(text: str) -> tuple[str, list[str]]:
    """Independent Python replay of the synthesis (NOT a port of the
    Spark expressions — list slicing + join from first principles)."""
    toks = [t for t in (text or "").lower().split(" ") if t]
    n = len(toks)
    cs = [" ".join(toks[(i * n) // 4 : ((i + 1) * n) // 4]) for i in range(4)]
    rendered = f"<|system|>\n{_SYS}\n"
    for role, c in zip(("user", "assistant", "user", "assistant"), cs):
        rendered += f"<|{role}|>\n{c}\n"
    return rendered, cs


def test_offset_constants_match_a_python_re_render(spark, tmp_path):
    # the hand-derived template constants (64, 89) are exactly where an
    # independent renderer finds the assistant contents — and the
    # extracted spans contain the contents verbatim, never a role tag
    from victor_spark.plans.catalog_r12 import q_sft_loss_mask_spans

    rows = [
        (0, "Alpha beta gamma delta epsilon zeta eta theta"),
        (10, "one two three"),  # n=3: quarter slices degenerate
        (20, ""),
        (30, None),
    ]
    _write_docs(spark, str(tmp_path), rows)
    spans = {
        (r["conv_id"], r["turn_idx"]): r
        for r in q_sft_loss_mask_spans(spark, str(tmp_path)).collect()
    }
    assert len(spans) == 8  # 4 convs x 2 assistant turns
    for doc_id, text in rows:
        rendered, cs = _render_py(text)
        for turn_idx, content in ((2, cs[1]), (4, cs[3])):
            r = spans[(doc_id, turn_idx)]
            got = rendered[r["start_off"] : r["end_off"]]
            assert got == content, (doc_id, turn_idx, got, content)
            assert "<|" not in got  # the mask never covers a tag
    # the constants pin: with empty contents the spans sit AT the
    # template constants with zero length
    assert spans[(20, 2)]["start_off"] == _C1_CONST
    assert spans[(20, 2)]["end_off"] == _C1_CONST
    assert spans[(20, 4)]["start_off"] == _C3_CONST
    assert spans[(30, 4)]["end_off"] == _C3_CONST


def test_null_and_empty_text_render_the_bare_template(spark, tmp_path):
    # NULL text is an in-domain 0-token conversation (the round-10
    # unigram_tokenize advice lesson): the render is the 90-char
    # template skeleton, assistant_frac 0 — and the oracle agrees
    # exactly (coalesced array_to_string on the DuckDB side)
    import duckdb

    from victor_spark.plans.catalog_r12 import PENDING as P12

    rows = [(0, None), (10, ""), (20, "   "), (30, "real words here now")]
    _write_docs(spark, str(tmp_path), rows)
    spec = P12["sft_render_conversations"]
    got = {r["conv_id"]: r for r in spec.build(spark, str(tmp_path)).collect()}
    skeleton, _ = _render_py("")
    for cid in (0, 10, 20):
        assert got[cid]["n_chars"] == len(skeleton) == 90
        assert got[cid]["n_assistant_chars"] == 0
        assert got[cid]["assistant_frac"] == 0.0
    assert got[30]["n_assistant_chars"] > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(
        spec.build(spark, str(tmp_path)),
        con.execute(spec.oracle_sql(str(tmp_path))).fetchdf(),
    )
    assert not problems, problems


def test_pack_tiles_each_bucket_without_gaps(spark):
    # concat-then-chunk invariants on the real corpus: within a bucket,
    # sorted start_offs + token counts tile the stream exactly (no
    # holes, no overlaps); pack_id is the chunk the conversation STARTS
    # in; and the loss budget is the exact token-count ratio
    pdf = PENDING["sft_pack_conversations"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) == 50
    for _, g in pdf.groupby("bucket"):
        g = g.sort_values("start_off")
        starts = g["start_off"].to_numpy()
        ends = (g["start_off"] + g["n_toks"]).to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == ends[:-1]).all()
        assert (g["pack_id"] == g["start_off"] // 256).all()
    expect = (pdf["n_assistant_toks"] / pdf["n_toks"]).round(6)
    assert (pdf["loss_frac"] == expect).all()
    assert (pdf["loss_frac"] < 1.0).all()  # template tokens never mask


def test_dpo_pairs_are_zero_shuffle(spark):
    # the render shape: pure per-row codegen, no Exchange, no Generate,
    # no Python — preference-pair assembly costs one scan at any size
    p = _plan(spark, "dpo_pair_assembly")
    assert "Exchange" not in p
    assert "Generate" not in p
    assert "EvalPython" not in p and "MapInPandas" not in p


def test_dpo_chooses_the_prose_candidate(spark, tmp_path):
    # the fluency prior's defining behavior: a conversation whose first
    # assistant turn is keyword soup and whose second is prose must
    # choose the prose turn (4); equal-score candidates tie-break to
    # the EARLIER turn (2); margins are the exact ratio differences
    from victor_spark.plans.catalog_r12 import q_dpo_pair_assembly

    # doc 0: c1 = tokens 5..9 (soup), c3 = tokens 15..19 (prose-heavy)
    soup_doc = " ".join(
        ["q0 q1 q2 q3 q4"]  # c0
        + ["kw1 kw2 kw3 kw4 kw5"]  # c1: zero stopwords
        + ["q5 q6 q7 q8 q9"]  # c2
        + ["the cat is in it"]  # c3: 4/5 stopwords
    )
    tie_doc = " ".join(f"t{j}" for j in range(20))  # no stopwords at all
    _write_docs(spark, str(tmp_path), [(0, soup_doc), (10, tie_doc)])
    got = {
        r["conv_id"]: r
        for r in q_dpo_pair_assembly(spark, str(tmp_path)).collect()
    }
    import hashlib

    assert got[0]["chosen_turn"] == 4
    assert got[0]["margin"] == 0.8  # 4/5 - 0/5
    assert (
        got[0]["chosen_md5"]
        == hashlib.md5(b"the cat is in it").hexdigest()
    )
    assert (
        got[0]["rejected_md5"]
        == hashlib.md5(b"kw1 kw2 kw3 kw4 kw5").hexdigest()
    )
    assert got[10]["chosen_turn"] == 2  # tie -> earlier turn
    assert got[10]["margin"] == 0.0


def test_screen_flags_planted_contamination_only(spark, tmp_path):
    # a doc divisible by BOTH strides (970) seeds an eval prompt AND a
    # conversation — the screen must surface that conversation; convs
    # from token-disjoint docs must NOT appear
    from victor_spark.plans.catalog_r12 import q_sft_contamination_screen

    shared = " ".join(f"evalword{j}" for j in range(20))
    rows = [(970, shared)] + [
        (i * 10, " ".join(f"doc{i}w{j}" for j in range(20)))
        for i in range(1, 8)
    ]
    _write_docs(spark, str(tmp_path), rows)
    out = q_sft_contamination_screen(spark, str(tmp_path)).collect()
    assert [r["conv_id"] for r in out] == [970]
    assert out[0]["n_shared"] >= 1
