#!/usr/bin/env python
"""Same-binaries interleaved worktree A/B — the documented bench-guard
adjudication recipe (established r9, replicated r12), promoted to a
tool so guard trips self-adjudicate instead of consuming a session.

This box's bench timings swing ±30% with EXTERNAL neighbor load; the
widest-fanning headline queries (q5, q3) trip the 1.2x guard first
under contention. The decisive experiment: check out a BASE commit
(default: the round-start snapshot) in a git worktree and run the
tripped query best-of-N INTERLEAVED with HEAD — same harness, same
time window, alternating A/B each round so external load hits both
equally. If both read the same inflated time, it is the host, not a
regression.

Usage:
  python tools/bench_ab.py --query tpch_q3_shipping_priority \
      [--base <commit>] [--rounds 4] [--band 1.10]

Verdict: HOST-NOISE when min(HEAD)/min(BASE) <= band (default 1.10),
REGRESSION otherwise. Exit 0 on host-noise, 1 on regression, 2 on
usage/setup errors. Record the JSON line in BASELINE.md either way.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the per-run timer executed INSIDE each worktree (cwd = worktree root,
#: so it imports THAT checkout's package): bench.py's steady-state
#: methodology — warm once (codegen/listings), time the second run.
_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from tigate_spark.catalog import get_catalog
from tigate_spark.session import get_spark
name = sys.argv[1]
spark = get_spark("tigate-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
df = get_catalog()[name].builder(spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print(json.dumps({"sec": round(time.monotonic() - t0, 3)}))
spark.stop()
"""


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(["git", *args], cwd=cwd, check=True,
                          capture_output=True, text=True).stdout.strip()


def _round_start_commit() -> str:
    """Default BASE: the most recent driver round snapshot commit."""
    out = _git("log", "--grep", "^round [0-9]*:", "-1", "--format=%H")
    if not out:
        raise SystemExit("no round-start commit found; pass --base")
    return out


def _run_once(workdir: str, query: str) -> float:
    p = subprocess.run([sys.executable, "-c", _RUNNER, query],
                       cwd=workdir, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
        raise SystemExit(f"runner failed in {workdir}")
    return json.loads(p.stdout.strip().splitlines()[-1])["sec"]


def _loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True,
                    help="headline catalog entry name (one query)")
    ap.add_argument("--base", default=None,
                    help="commit-ish for side A (default: round-start)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--band", type=float, default=1.10,
                    help="min(HEAD)/min(BASE) above this = REGRESSION")
    args = ap.parse_args()

    base = args.base or _round_start_commit()
    base_sha = _git("rev-parse", "--short", base)
    head_sha = _git("rev-parse", "--short", "HEAD")
    wt = f"/tmp/tigate-ab-{base_sha}"
    if not os.path.isdir(wt):
        # a stale registration without the dir blocks re-add
        subprocess.run(["git", "worktree", "prune"], cwd=REPO, check=True)
        subprocess.run(["git", "worktree", "add", "--detach", wt, base],
                       cwd=REPO, check=True, capture_output=True)
    try:
        runs = {"base": [], "head": []}
        loads = []
        for i in range(args.rounds):
            # alternate which side goes first so slow drifts hit both
            order = (("base", wt), ("head", REPO)) if i % 2 == 0 else (
                ("head", REPO), ("base", wt))
            for side, cwd in order:
                loads.append(_loadavg())
                sec = _run_once(cwd, args.query)
                runs[side].append(sec)
                print(f"round {i + 1}/{args.rounds} {side}"
                      f" ({base_sha if side == 'base' else head_sha}):"
                      f" {sec:.3f}s  load={loads[-1]}", flush=True)
        min_base, min_head = min(runs["base"]), min(runs["head"])
        ratio = round(min_head / min_base, 3) if min_base else float("inf")
        verdict = "HOST-NOISE" if ratio <= args.band else "REGRESSION"
        print(json.dumps({
            "metric": "bench_ab", "query": args.query,
            "base": base_sha, "head": head_sha,
            "base_runs": runs["base"], "head_runs": runs["head"],
            "min_base": min_base, "min_head": min_head,
            "head_over_base": ratio, "band": args.band,
            "load_avg": loads, "verdict": verdict,
        }))
        sys.exit(0 if verdict == "HOST-NOISE" else 1)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
