"""Regenerate CATALOG.md — the one-line-per-query index of the catalog.

Every entry in plans/catalog.py registers a short description with its
(Spark builder, DuckDB oracle) pair; this tool renders them as a single
reviewable table so the coverage inventory is greppable without reading
5k lines of builder code. Run after adding queries:

    python tools/gen_catalog_md.py > CATALOG.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from victor_spark.plans import QUERIES

    n = len(QUERIES)
    oracle = sum(1 for s in QUERIES.values() if s.oracle is not None)
    dynamic = sum(1 for s in QUERIES.values() if callable(s.oracle))
    print("# Catalog index")
    print()
    print(
        f"{n} queries; {oracle} oracle-checked ({dynamic} via dynamic "
        "oracles resolved at gate time), listed ALPHABETICALLY — a "
        "stable order independent of the driver's per-round gate "
        "schedule (plans/catalog.py::_gate_order recomputes that from "
        "whatever CORRECTNESS_r*.json artifacts exist on disk, so a "
        "gate-ordered listing goes stale the moment the driver drops a "
        "new artifact; round-6 verdict item 1). Regenerate with "
        "`python tools/gen_catalog_md.py > CATALOG.md`."
    )
    print()
    def table(specs) -> None:
        print("| # | query | oracle | what it is |")
        print("|---|---|---|---|")
        for i, name in enumerate(sorted(specs), 1):
            spec = specs[name]
            kind = (
                "dynamic" if callable(spec.oracle)
                else "sql" if spec.oracle is not None
                else "rows-only"
            )
            doc = " ".join((spec.doc or "").split())
            print(f"| {i} | `{name}` | {kind} | {doc} |")

    table(QUERIES)

    try:
        from victor_spark.plans.catalog_r11 import PENDING
    except ImportError:
        PENDING = {}
    staged = {k: v for k, v in PENDING.items() if k not in QUERIES}
    if staged:
        print()
        print("## Staged (next-round registration)")
        print()
        print(
            f"{len(staged)} queries built and oracle-hardened this round, "
            "registered at next round's start (the gate-window staging "
            "pattern — see plans/catalog_r11.py's module docstring). "
            "Covered NOW by tests/test_r11_pending.py at two SFs and by "
            "`tools/driver_sim.py --pending` in a vanilla session."
        )
        print()
        table(staged)


if __name__ == "__main__":
    main()
