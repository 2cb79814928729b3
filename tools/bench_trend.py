#!/usr/bin/env python
"""Round-over-round bench trend: compare the newest BENCH_r{N}.json (or
a file given with --new) against every earlier round's file and flag
per-query regressions beyond a noise threshold.

The r4 verdict flagged 13-42% upticks that n=1 timing could not
distinguish from noise; bench.py now reports a median of 3 with the
spread kept, so this tool treats a regression as real only when the new
MEDIAN exceeds the old median by more than --threshold (default 30%)
AND the two runs' spreads do not overlap.

Usage: python tools/bench_trend.py [--threshold 0.3] [--new FILE]
Exit 1 if any real regression is flagged (wire into the round's
self-checks next to plan_audit).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys


def load(path):
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    argv = sys.argv[1:]
    threshold = 0.3
    if "--threshold" in argv:
        threshold = float(argv[argv.index("--threshold") + 1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = {}
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if m:
            files[int(m.group(1))] = p
    if "--new" in argv:
        new = load(argv[argv.index("--new") + 1])
        new_round = max(files) + 1 if files else 0
    elif files:
        new_round = max(files)
        new = load(files.pop(new_round))
    else:
        print("no BENCH_r*.json found")
        return 0
    if not files:
        print("no earlier round to compare against")
        return 0
    prev_round = max(files)
    prev = load(files[prev_round])
    flagged = []
    for q, t_new in new.get("queries", {}).items():
        t_old = prev.get("queries", {}).get(q)
        if t_old is None or t_old <= 0:
            continue
        ratio = t_new / t_old
        if ratio <= 1 + threshold:
            continue
        runs_new = new.get("runs", {}).get(q)
        runs_old = prev.get("runs", {}).get(q)
        overlap = None
        if runs_new and runs_old:
            overlap = min(runs_new) <= max(runs_old)
        if overlap:
            verdict = "noise (spreads overlap)"
        else:
            verdict = "REGRESSION"
            flagged.append(q)
        print(f"{q}: r{prev_round} {t_old:.3f}s -> r{new_round} "
              f"{t_new:.3f}s ({ratio:.2f}x) — {verdict}")
    if not flagged:
        print(f"no real regressions vs r{prev_round} "
              f"(threshold {threshold:.0%}, spread-overlap rule)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
