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
       python tools/bench_trend.py --board BENCH_TREND.md

--board writes the committed CALIBRATION-NORMALIZED trend table
(VERDICT r7 item 5): one row per query, one column per round, each cell
the round's median divided by that run's calibration-probe mean and
re-scaled to reference-host seconds (x CALIB_REF).  BENCH_NOTES.md
documents up to 5x host-speed swing between sessions — raw medians are
not comparable across rounds; this board is.  Rounds recorded before
bench.py grew the calib probe (r1-r6) are shown RAW and marked, and the
builder's own current-round run (BENCH_DETAIL.json) appears as the
rightmost column so the board always includes the round in progress.
Exit 1 (regression mode) if any real regression is flagged.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

# reference calibration-probe time: cells are median / calib_mean *
# CALIB_REF, i.e. "seconds on a host whose probe runs in 70 ms" — the
# builder's typical probe, so normalized numbers read like familiar raw
# medians from a builder session
CALIB_REF = 0.070


def load(path):
    with open(path) as fh:
        return json.load(fh)


def _norm_factor(parsed) -> float | None:
    calib = parsed.get("calib")
    if not calib:
        return None
    mean = sum(calib) / len(calib)
    return CALIB_REF / mean if mean > 0 else None


def board(out_path: str) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cols: list[tuple[str, dict, float | None]] = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        parsed = load(p).get("parsed") or {}
        if not parsed.get("queries"):
            continue  # r5's driver tail capture was empty
        cols.append((f"r{int(m.group(1))}", parsed, _norm_factor(parsed)))
    detail = os.path.join(root, "BENCH_DETAIL.json")
    if os.path.exists(detail):
        d = load(detail)
        meds = d.get("medians", {})
        # baseline-13 subtotal for the builder column = the queries the
        # r1 driver run recorded (the original baseline set)
        b13 = [c for c in cols if c[0] == "r1"]
        bsum = None
        if b13:
            ks = [k for k in b13[0][1]["queries"] if k in meds]
            bsum = sum(meds[k] for k in ks) if len(ks) == len(
                b13[0][1]["queries"]) else None
        parsed = {"queries": meds, "calib": d.get("calib"),
                  "baseline_set_value": bsum}
        cols.append(("cur", parsed, _norm_factor(parsed)))
    names: list[str] = []
    for _, parsed, _f in cols:
        for q in parsed["queries"]:
            if q not in names:
                names.append(q)
    lines = [
        "# Calibration-normalized bench trend",
        "",
        f"Cells are median seconds x (CALIB_REF={CALIB_REF} / run's "
        "calib-probe mean) — i.e. rescaled to a fixed reference host. "
        "Columns marked `(raw)` predate the calib probe and are raw "
        "medians (BENCH_NOTES.md: up to 5x host swing — compare those "
        "with care).  `cur` is the builder's own in-round run "
        "(BENCH_DETAIL.json); `r{N}` are the driver's recorded runs.",
        "",
        "| query | " + " | ".join(
            f"{c}{'' if f else ' (raw)'}" for c, _p, f in cols) + " |",
        "|---|" + "---|" * len(cols),
    ]
    for q in names:
        cells = []
        for _c, parsed, f in cols:
            v = parsed["queries"].get(q)
            if v is None:
                cells.append("")
            else:
                cells.append(f"{v * (f or 1.0):.3f}")
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    r1_set = set(cols[0][1]["queries"]) if cols and cols[0][0] == "r1" \
        else None
    subtot = []
    for _c, parsed, f in cols:
        v = parsed.get("baseline_set_value")
        if v is None and r1_set is not None:
            qs = parsed["queries"]
            if set(qs) == r1_set:          # pre-r6 runs: the headline
                v = parsed.get("value")    # value IS the baseline set
            elif r1_set <= set(qs):
                v = round(sum(qs[k] for k in r1_set), 3)
        subtot.append(f"{v * (f or 1.0):.3f}" if v is not None else "")
    lines.append("| **baseline-13 subtotal** | "
                 + " | ".join(subtot) + " |")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(names)} queries x {len(cols)} rounds)")
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if "--board" in argv:
        return board(argv[argv.index("--board") + 1])
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
