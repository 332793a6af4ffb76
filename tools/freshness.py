#!/usr/bin/env python
"""External-freshness report: for every catalog entry, the latest round
whose CORRECTNESS_r*.json shows it green — the input to each round's
_PRIORITY rotation (oldest-first drain). Prints per-round cohorts and
never-green entries.

Usage: python tools/freshness.py [--cohorts]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for name, res in json.load(open(f)).items():
            ok = res.get("hash_match") or (
                res.get("rows_match") and res.get("err") is None)
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    from tigate_spark.catalog import get_catalog

    latest = latest_green()
    cat = list(get_catalog())
    never = [n for n in cat if n not in latest]
    byround: dict[int, list[str]] = {}
    for n in cat:
        if n in latest:
            byround.setdefault(latest[n], []).append(n)
    print(f"catalog: {len(cat)} entries; never externally green: "
          f"{len(never)} {never}")
    for rnd in sorted(byround):
        names = sorted(byround[rnd])
        print(f"r{rnd}: {len(names)}")
        if "--cohorts" in sys.argv:
            for n in names:
                print(f"  {n}")


if __name__ == "__main__":
    main()
