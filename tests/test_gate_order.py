"""The driver's correctness gate checks queries() in dict order under a
row cap, so the catalog's registry order IS the gate schedule. Round-4
verdict task 4: the schedule must be computed from the accumulated
CORRECTNESS_r*.json artifacts (never-green first, diff-touched second,
oldest-green third), not hand-maintained lists. These tests pin the
computed ordering's invariants against the committed artifacts."""

from __future__ import annotations

from victor_spark.plans import QUERIES
from victor_spark.plans.catalog import (
    _TOUCHED_THIS_ROUND,
    _last_green_rounds,
    _ordering,
    _row_is_green,
)


def test_row_green_classification():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    assert _row_is_green(ok)
    # rows-only checks (no oracle_sql) leave hash_match null — still green
    assert _row_is_green({**ok, "hash_match": None})
    assert not _row_is_green({**ok, "hash_match": False})
    assert not _row_is_green({**ok, "rows_match": False})
    assert not _row_is_green({**ok, "err": "no_oracle"})
    assert not _row_is_green({**ok, "err": "Traceback ..."})
    assert not _row_is_green("not a dict")


def test_never_green_queries_lead():
    last_green = _last_green_rounds()
    names = list(QUERIES)
    never = {n for n in names if n not in last_green}
    # every never-green query sits strictly before every green one
    if never:
        last_never_idx = max(names.index(n) for n in never)
        first_green_idx = min(
            names.index(n) for n in names if n in last_green
        )
        assert last_never_idx < first_green_idx, (
            "a green-tail query precedes a never-driver-green query: "
            f"{sorted(never)}"
        )


def test_touched_queries_follow_never_green():
    last_green = _last_green_rounds()
    names = list(QUERIES)
    never = [n for n in names if n not in last_green]
    touched = [
        n for n in _TOUCHED_THIS_ROUND if n in QUERIES and n in last_green
    ]
    assert names[: len(never) + len(touched)] == never + touched


def test_green_tail_is_oldest_first():
    last_green = _last_green_rounds()
    names = list(QUERIES)
    tail_rounds = [
        last_green[n]
        for n in names
        if n in last_green and n not in _TOUCHED_THIS_ROUND
    ]
    assert tail_rounds == sorted(tail_rounds)


def test_synthetic_future_artifact_cannot_break_the_schedule(tmp_path):
    """The round-10 failure class, pinned for good: the moment the
    driver drops a CORRECTNESS artifact marking this round's
    registrations green, every schedule invariant must still hold. We
    simulate that exact event — copy the real artifacts into a tmp root,
    add a synthetic future-round artifact marking EVERY query green —
    and assert the recomputed ordering stays total, a permutation of the
    catalog, and tiered correctly. No assertion anywhere in the suite
    may claim a fixed set of queries is never-green (that claim is
    time-bound; see test_no_pending_test_couples_to_artifacts)."""
    import glob
    import json
    import os
    import shutil

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path)
    future = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in QUERIES
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(future))
    last_green = _last_green_rounds(str(tmp_path))
    # every query now has a green row — the never tier is EMPTY
    assert set(last_green) >= set(QUERIES)
    names = list(QUERIES)
    ordered = _ordering(names, last_green, _TOUCHED_THIS_ROUND)
    assert sorted(ordered) == sorted(names)  # total permutation
    touched = [
        n for n in _TOUCHED_THIS_ROUND if n in QUERIES and n in last_green
    ]
    assert ordered[: len(touched)] == touched
    tail_rounds = [last_green[n] for n in ordered[len(touched):]]
    assert tail_rounds == sorted(tail_rounds)


def test_no_pending_test_couples_to_artifacts():
    """Lint guard for the exact recurrence vector: registration tests
    (tests/test_r*_pending.py) may assert spec IDENTITY only — any
    reference to the artifact-derived never-green state
    (`_last_green_rounds`) in those files re-creates the time-bomb the
    round-10 judge flagged (test_r10_pending asserted its 8 queries
    were never-green; the driver's own CORRECTNESS_r10.json then
    falsified the claim and turned the tree red)."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "test_r*_pending.py")):
        with open(path) as f:
            src = f.read()
        assert "_last_green_rounds" not in src, (
            f"{os.path.basename(path)} couples a registration assertion "
            "to the CORRECTNESS artifacts — assert spec identity only"
        )


def test_round4_misplaced_queries_are_front():
    """The concrete round-4 finding: pca_project and multimodal_features
    have no green driver row (their r1 rows predate their oracles) and
    must lead the round-5 gate window."""
    names = list(QUERIES)
    last_green = _last_green_rounds()
    n_never = sum(1 for n in names if n not in last_green)
    for q in ("pca_project", "multimodal_features"):
        if q not in last_green:  # still pending a green row
            assert names.index(q) < n_never  # inside the never-green tier
