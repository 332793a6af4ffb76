#!/usr/bin/env python
"""External-freshness report: for every catalog entry, the latest round
whose CORRECTNESS_r*.json shows it green — the input to each round's
_PRIORITY rotation (oldest-first drain). Prints per-round cohorts and
never-green entries.

Usage: python tools/freshness.py [--cohorts] [--check-floor N] [--window N]

``--check-floor N``: exit nonzero unless EVERY catalog entry's latest
external green is round >= N (and none is never-green) — run this
BEFORE writing any commit message that claims "freshness floor moves to
rX" (r15 shipped exactly that claim with one r9 straggler because
nobody recomputed; VERDICT r15 task #1).

``--window N``: simulate the next round — assume the first N entries of
__spark_entry__._PRIORITY go green and print the resulting floor and
any stragglers below it, so the window is sized BEFORE the round runs.
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


def _argval(flag: str) -> int | None:
    if flag not in sys.argv:
        return None
    idx = sys.argv.index(flag)
    if idx + 1 >= len(sys.argv) or not sys.argv[idx + 1].isdigit():
        print(f"usage: {flag} N (round number) — got "
              f"{sys.argv[idx + 1:idx + 2] or 'nothing'}")
        sys.exit(2)
    return int(sys.argv[idx + 1])


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

    fail = False
    floor = _argval("--check-floor")
    if floor is not None:
        bad = sorted(n for n in cat
                     if n not in latest or latest[n] < floor)
        if bad:
            print(f"FLOOR-CHECK FAIL: {len(bad)} entries below r{floor}: "
                  f"{bad}")
            fail = True
        else:
            print(f"FLOOR-CHECK OK: every entry green at r{floor}+")

    win = _argval("--window")
    if win is not None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "__spark_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        nxt = max(latest.values(), default=0) + 1
        sim = dict(latest)
        for n in mod._PRIORITY[:win]:
            sim[n] = nxt
        still_never = sorted(n for n in cat if n not in sim)
        new_floor = min((sim[n] for n in cat if n in sim), default=0)
        stragglers = sorted(
            n for n in cat if n in sim and sim[n] == new_floor)
        print(f"WINDOW SIM (first {win} of _PRIORITY green at r{nxt}): "
              f"floor r{new_floor}, {len(stragglers)} at the floor"
              f"{'; NEVER-GREEN: ' + str(still_never) if still_never else ''}")
        if len(stragglers) <= 10:
            for n in stragglers:
                print(f"  {n}")
    if fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
