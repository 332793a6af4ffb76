"""Codegen-width probe for P1 ``column_selectors`` (r15 verdict watch
item): the dispatch form builds O(columns x rules) nested CASE
expressions per column (``operators/projections.py``), and this repo
has hit janino's 64 KB generated-method limit on CASE chains before
(r5 craft fold). Drive a 45-column frame through ~50 selector rules
and report whether the Project stays inside whole-stage codegen
(``*(N)`` prefix in the executed plan) or falls back to interpreted
evaluation, plus the wall for a full pass at sf0.01.

Usage: python tools/probe_selector_codegen.py [--cols 45] [--rules 50]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=45)
    ap.add_argument("--rules", type=int, default=50)
    ap.add_argument("--fold", choices=["auto", "on", "off"], default="auto",
                    help="force the folded (wide-tree) or nested "
                         "(per-column CASE chain) dispatch form; auto = "
                         "the FOLD_RULE_THRESHOLD gate")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tigate_spark.config import ColumnSelector
    from tigate_spark.operators.projections import META_COLS, column_selectors
    from tigate_spark.session import ensure_confs
    from tigate_spark.sources.changes import changes_stream

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    ensure_confs(spark)

    ch = changes_stream(spark, args.sf)
    n_payload = args.cols - len(ch.columns)
    wide = ch.select(
        "*", *[(F.col("value_cents") + F.lit(i)).alias(f"c{i:02d}")
               for i in range(max(0, n_payload))])
    rules = []
    for i in range(args.rules):
        # vary matcher + column patterns so no rule folds away
        rules.append(ColumnSelector(
            matcher=[f"app.t{i % 4}"],
            columns=["*", f"!c{i % max(1, n_payload):02d}"]))
    fold = {"auto": None, "on": True, "off": False}[args.fold]
    out = column_selectors(wide, rules, fold=fold)

    t0 = time.time()
    n = out.count()
    wall = time.time() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # whole-stage codegen nodes carry a "*(k)" prefix; an interpreted
    # fallback leaves the Project bare
    proj_lines = [ln for ln in plan.splitlines() if "Project" in ln]
    # bool() guard: all() over an empty list is vacuously True — no
    # Project node found must read as NOT-verified, not WHOLE-STAGE
    codegen = bool(proj_lines) and all(
        re.search(r"\*\(\d+\)", ln) for ln in proj_lines)
    if not proj_lines:
        print("WARNING: no Project node found in the executed plan — "
              "verdict unreliable")
    payload = [c for c in wide.columns if c not in META_COLS]
    print(f"cols={len(wide.columns)} (payload={len(payload)}) "
          f"rules={len(rules)} rows={n} wall={wall:.2f}s "
          f"codegen={'WHOLE-STAGE' if codegen else 'INTERPRETED-FALLBACK'}")
    for ln in proj_lines[:2]:
        print("  plan:", ln.strip()[:120])


if __name__ == "__main__":
    main()
