#!/usr/bin/env python3
"""Regenerate graft.Budgets.perQuery from two full-bench logs.

Usage: python3 tools/budgets.py <bench_a.log> <bench_b.log> [round_tag]
Reads the per_query + total JSON lines from each log, normalizes every
sample by that run's calibration factor, and prints the Scala map body:
budget = max(FLOOR, ceil10(2.5 * max(a, b))) with both samples cited —
the stated two-full-board-sample policy (VERDICT r7 "what's wrong" #3).
FLOOR = 3.0 (Budgets.Floor): sub-second-sample queries measure scheduler
noise, not plans, below it (VERDICT r8 "next round" #1a).
"""
import json, math, sys

FLOOR = 3.0  # keep in sync with graft.Budgets.Floor

def load(path):
    per, factor = None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric":"per_query"'):
                per = json.loads(line)["queries"]
            elif line.startswith('{"metric":"total"'):
                factor = json.loads(line)["budget_factor"]
    if per is None or factor is None:
        sys.exit(f"missing per_query/total record in {path}")
    return {k: v / factor for k, v in per.items()}, factor

a_path, b_path = sys.argv[1], sys.argv[2]
tag = sys.argv[3] if len(sys.argv) > 3 else "r11"
a, fa = load(a_path)
b, fb = load(b_path)
only_one = sorted(set(a) ^ set(b))
print(f"  // factors: a={fa} b={fb}"
      + (f"; single-sample (landed between runs): {only_one}" if only_one else ""))
for q in sorted(set(a) | set(b)):
    samples = [s[q] for s in (a, b) if q in s]
    raw = math.ceil(2.5 * max(samples) * 10) / 10
    budget = max(FLOOR, raw)
    cite = "/".join(f"{s:.2f}" for s in samples)
    note = "" if len(samples) == 2 else " — ONE sample, re-sample next round"
    floor = (f" [raw 2.5x budget {raw}, raised to the 3 s metrology floor]"
             if raw < FLOOR else "")
    print(f'    "{q}" -> {budget}, // {tag} full-bench samples '
          f'{cite} (calibration-normalized){note}{floor}')
