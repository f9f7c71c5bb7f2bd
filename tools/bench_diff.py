"""Diff two bench.py JSON outputs per query.

Usage: python tools/bench_diff.py before.json after.json [top_n]

Each file is the FIRST stdout line of bench.py (the full result with
"queries"/"per_query_min"). Prefers per_query_min when present (the
noise-robust steady-state evidence). Prints per-query before/after/ratio
sorted by absolute time saved, plus totals and calibration context.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        for line in f:
            if line.startswith('{"metric"'):
                d = json.loads(line)
                if "queries" in d or "per_query_min" in d:
                    return d
    raise SystemExit(f"no full bench result line in {path}")


def main() -> None:
    before, after = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    qb = before.get("per_query_min") or before["queries"]
    qa = after.get("per_query_min") or after["queries"]
    common = sorted(set(qb) & set(qa), key=lambda q: qb[q] - qa[q], reverse=True)
    print(f"# calib before: roundtrip {before.get('calib_roundtrip_ms')}ms "
          f"shuffle {before.get('calib_shuffle_ms')}ms | after: "
          f"roundtrip {after.get('calib_roundtrip_ms')}ms "
          f"shuffle {after.get('calib_shuffle_ms')}ms")
    tb = sum(qb[q] for q in common)
    ta = sum(qa[q] for q in common)
    print(f"# common {len(common)} queries: before {tb:.1f}s after {ta:.1f}s "
          f"ratio {ta / tb:.3f}")
    print(f"{'query':34s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
    shown = common[:top_n] + [q for q in common[-10:] if q not in common[:top_n]]
    for q in shown:
        r = qa[q] / qb[q] if qb[q] else float("nan")
        print(f"{q:34s} {qb[q]:8.3f} {qa[q]:8.3f} {r:6.2f}")


if __name__ == "__main__":
    main()
