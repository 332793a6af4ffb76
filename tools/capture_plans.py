#!/usr/bin/env python
"""Capture .explain('formatted') for every headline (bench=True) query
into plans/<tag>/<name>_<suffix>.txt, for the optimization-round record.

Usage: python tools/capture_plans.py --tag r17 --suffix before [--only a,b]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tigate_spark.catalog import get_catalog  # noqa: E402
from tigate_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r17")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    cat = get_catalog()
    names = sorted(n for n, s in cat.items() if s.bench)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    for name in names:
        df = cat[name].builder(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
