#!/usr/bin/env python3
"""One-shot fold of the driver BENCH_r13 record into graft.Budgets (r13
verdict "next round" #4): the cleanest driver sample on record —
calibration factor exactly 1.000, drift median 0.847, zero breaches,
zero isolated reruns, 321/321 queries — so EVERY row folds its measured
time under the standing max ratchet (no exclusions needed, unlike the
r12 fold): budget = max(current, max(3.0, 2.5 * r13_time)). Nothing is
ever lowered. The full per-query map comes from the BENCH_FULL_LAST.json
the round-13 closing commit carried (the in-repo durable record added
for exactly this purpose — the driver's stdout tail truncates the
leading alphabetical entries). Run once; kept for audit.
"""
import json, re, subprocess

FACTOR = 1.000  # BENCH_r13 budget_factor — normalized == raw
FLOOR = 3.0
COMMIT = "7e73cbe"  # round-13 closing record

full = subprocess.run(["git", "show", f"{COMMIT}:BENCH_FULL_LAST.json"],
                      capture_output=True, text=True, cwd="/root/repo",
                      check=True).stdout
per_query = None
for line in full.splitlines():
    d = json.loads(line)
    if d.get("metric") == "per_query":
        per_query = d["queries"]
assert per_query and len(per_query) == 321, len(per_query or {})

src = open("/root/repo/src/main/scala/graft/Budgets.scala").read()
lines = src.split("\n")
out, governed, folded, absent = [], [], 0, []
row_re = re.compile(r'^(    "([a-z0-9_]+)" -> )([0-9.]+)(, // )(.*)$')
for ln in lines:
    m = row_re.match(ln)
    if not m:
        out.append(ln)
        continue
    prefix, name, budget_s, sep, comment = m.groups()
    budget = float(budget_s)
    if name not in per_query:
        absent.append(name)
        out.append(ln)
        continue
    t = per_query[name] / FACTOR
    proposed = max(FLOOR, 2.5 * t)
    folded += 1
    if proposed > budget:
        governed.append((name, budget, round(proposed, 1), t))
        out.append(f'{prefix}{round(proposed, 1)}{sep}{comment}; driver r13 '
                   f'{t:.2f} GOVERNS (2.5x ratchet from {budget})')
    else:
        out.append(f'{prefix}{budget_s}{sep}{comment}; driver r13 {t:.2f} '
                   f'folds below the ratchet')
open("/root/repo/src/main/scala/graft/Budgets.scala", "w").write("\n".join(out))
print(f"folded {folded} rows; {len(governed)} governed:")
for g in governed:
    print(" ", g)
print("no r13 sample (post-r13 queries):", absent)
