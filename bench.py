#!/usr/bin/env python
"""Bench harness: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "runs": K, "samples": {...}, "loadavg": [...]}

Each query executes fully (noop sink — no driver collect) so the number
measures the distributed plan, not result transfer.

Noise robustness (r16 verdict task #1): host timing noise here is ±30%
run-to-run and a single loaded-host sample once printed a 2.41× reading
for untouched code. The artifact now carries per-query BEST-OF-N
(default N=3 timed passes after a warm-up pass), taken ROUND-ROBIN —
pass 1 runs every query once, then pass 2, ... — so a transient host
spike lands on at most one sample per query instead of all of them.
`samples` (all raw timings) and `loadavg` (1-min load before each pass)
ride along so a judge can adjudicate noise from the artifact alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tigate_spark.catalog import get_catalog  # noqa: E402
from tigate_spark.session import get_spark  # noqa: E402


def main() -> None:
    _load0 = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark("tigate-bench", cpus=cpus)
    cat = get_catalog()
    headline = {n: s for n, s in cat.items() if s.bench}
    names = sorted(headline)

    # Steady-state methodology: execute each query once untimed (compiles
    # its whole-stage-codegen classes, loads file listings), then time
    # `runs` further full executions and keep the per-query minimum. At
    # this SF cold-run numbers are ~50% query-specific JVM compilation —
    # a constant that is noise at the 100 TB design point, where the same
    # generated code runs for hours.
    dfs = {n: headline[n].builder(spark, sf_dir) for n in names}
    for name in names:  # warm-up pass (codegen + file listings)
        dfs[name].write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    # first element = load BEFORE this process did any work (the
    # external-neighbor signal); later elements are taken before each
    # timed pass and include this bench's own warm JVM
    loadavg: list[float] = [_load0]
    for _ in range(runs):
        loadavg.append(round(os.getloadavg()[0], 2))
        for name in names:
            t0 = time.monotonic()
            dfs[name].write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.monotonic() - t0, 3))
    loadavg.append(round(os.getloadavg()[0], 2))

    times = {n: min(samples[n]) for n in names}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "runs": runs,
                "samples": samples,
                "loadavg": loadavg,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
