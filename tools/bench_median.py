#!/usr/bin/env python
"""Median-of-N bench harness (VERDICT r3 next #6).

Runs the full bench N times in fixed registry order (one fresh
SparkSession per run, so caches never leak across runs) and reports
per-query median and spread.  The round-3 "max over four runs"
envelope let a 7.9 s outlier pass as in-envelope; the median with a
recorded spread makes session-variance visible instead of hiding it.

Usage: python tools/bench_median.py [N]   (default 5)
Prints one JSON object: {"runs": N, "totals": [...], "queries":
{name: {"median": s, "min": s, "max": s}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    per: dict[str, list[float]] = {}
    totals: list[float] = []
    env = dict(os.environ)
    for r in range(n):
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True, env=env,
        )
        cands = [l for l in out.stdout.splitlines() if l.startswith("{")]
        # bench.py ends with a compact capture-window line (r15
        # protocol); the verbose result is the one carrying "protocol"
        verbose = [l for l in cands if '"protocol"' in l]
        res = json.loads((verbose or cands)[-1])
        totals.append(res["value"])
        for q, t in res["queries"].items():
            per.setdefault(q, []).append(t)
        print(f"# run {r + 1}/{n}: total {res['value']}s", file=sys.stderr)
    queries = {
        q: {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
        }
        for q, ts in sorted(per.items())
    }
    print(json.dumps({
        "runs": n,
        "totals": totals,
        "total_median": round(statistics.median(totals), 3),
        "queries": queries,
        "protocol": (
            f"median-of-{n} full bench runs, fresh session each; "
            "each run is bench.py's single-session mean"
        ),
    }))


if __name__ == "__main__":
    main()
