#!/usr/bin/env python
"""Bench regression guard: run bench.py best-of-N and compare per-query
against a reference BENCH JSON (default BENCH_r02.json, the round-2 mark).

Host timing noise on this machine is ±30% run-to-run, so the guard takes
the per-query MINIMUM across N runs before applying the 1.2x tolerance;
known, documented semantic slowdowns can be waived via WAIVERS.

Usage: python tools/bench_guard.py [--runs 3] [--ref BENCH_r02.json]
Exit nonzero if any unwaived query exceeds tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOLERANCE = 1.2
#: documented semantic changes (query -> reason), exempt from the gate.
#: (the long-standing dedup_ngram_jaccard waiver was retired in r06: the
#: single-pass posting rewrite put it at ~0.3x of its mark — and
#: re-instated in r18, see below.)
WAIVERS: dict[str, str] = {
    # r18: the ~0.2 s readings since r06 were CACHE READS — the posting
    # aggregate was persist()-ed and every warm bench pass after the
    # first read it (0.182 s at 10x the corpus, scale-independent). The
    # persist was removed as cross-run result caching; the honest
    # pipeline reads ~0.83-1.1 s at sf0.1, 1.1-1.5x the r02 mark that
    # was never an honest-compute mark for this shape. Identical
    # results; OPTIMIZATION_r18.md §9 has the full record.
    "dedup_ngram_jaccard": "r18 measurement-honesty fix: pre-r18 "
                           "readings were persisted-aggregate cache "
                           "reads, not compute",
}


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    # bench.py takes best-of-3 internally since r17 (round-robin passes
    # + loadavg in the artifact), so one guard run already carries the
    # noise robustness the old min-of-3 wrapper provided
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--ref", default=os.path.join(REPO, "BENCH_r02.json"))
    args = ap.parse_args()

    with open(args.ref) as f:
        ref_doc = json.load(f)
    parsed = ref_doc.get("parsed") or ref_doc
    ref = parsed.get("queries")
    if not ref:
        print(f"reference {args.ref} has no queries map", file=sys.stderr)
        sys.exit(2)

    best: dict[str, float] = {}
    for i in range(args.runs):
        got = run_bench()["queries"]
        for q, t in got.items():
            best[q] = min(best.get(q, float("inf")), t)
        print(f"run {i + 1}/{args.runs}: total {sum(got.values()):.2f}s", flush=True)

    failed = []
    for q, t in sorted(best.items()):
        if q not in ref:
            print(f"  {q}: {t:.3f}s (new — no reference)")
            continue
        ratio = t / ref[q] if ref[q] else float("inf")
        mark = ""
        if ratio > TOLERANCE:
            if q in WAIVERS:
                mark = f"  WAIVED: {WAIVERS[q]}"
            else:
                mark = "  REGRESSION"
                failed.append(q)
        print(f"  {q}: {t:.3f}s vs {ref[q]:.3f}s ({ratio:.2f}x){mark}")

    print(f"\n{'FAIL' if failed else 'OK'}: {failed or 'no unwaived regressions'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
