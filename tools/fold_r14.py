#!/usr/bin/env python3
"""One-shot fold of the driver BENCH_r14 record into graft.Budgets (r14
verdict "next round" #5): 467.7 s over 330 queries at calibration factor
exactly 1.000, zero breaches — but a LOADED record (the verdict's own
diagnosis), so the r12-style exclusion rules apply instead of the r13
fold-everything rule:
  (a) the seven rows the record itself cold-rerun and dismissed as load
      artifacts fold their ISOLATED-RERUN time, not the loaded measured
      time (the isolated_reruns map in the record);
  (b) the six 2.0-2.7x-elevated sub-budget rows the verdict marked as the
      round's watch list are EXCLUDED outright — unadjudicated under the
      then-current breach-only rerun trigger (closed this round by the
      drift-outlier rerun, Bench.driftCandidates); their rows carry the
      exclusion inline and the round-15 closing pair records the
      adjudication;
  (c) everything else max-ratchets: budget = max(current, max(3.0,
      2.5 * r14_time)). Nothing is ever lowered.
The full per-query map is the BENCH_FULL_LAST.json the round-14 driver
commit carried. Run once; kept for audit.
"""
import json, re, subprocess

FACTOR = 1.000  # BENCH_r14 budget_factor — normalized == raw
FLOOR = 3.0
COMMIT = "057d09f"  # round-14 driver commit carrying the r14 full record

WATCH = {  # (b): the r14 verdict's six unadjudicated drift rows
    "pipeline_retrieval_stack", "pipeline_training_data", "rank_knn_kcore",
    "pipeline_dsir_select", "pipeline_skills_for_jobs", "pipeline_forget",
}

full = subprocess.run(["git", "show", f"{COMMIT}:BENCH_FULL_LAST.json"],
                      capture_output=True, text=True, cwd="/root/repo",
                      check=True).stdout
per_query, reruns = None, {}
for line in full.splitlines():
    d = json.loads(line)
    if d.get("metric") == "per_query":
        per_query = d["queries"]
    if d.get("metric") == "total":
        reruns = d.get("isolated_reruns", {})  # (a): name -> [measured, iso]
assert per_query and len(per_query) == 330, len(per_query or {})
assert len(reruns) == 7, reruns

src = open("/root/repo/src/main/scala/graft/Budgets.scala").read()
lines = src.split("\n")
out, governed, folded, absent, excluded, iso_folds = [], [], 0, [], [], []
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
    if name in WATCH:
        excluded.append((name, per_query[name]))
        out.append(f'{prefix}{budget_s}{sep}{comment}; driver r14 '
                   f'{per_query[name]:.2f} EXCLUDED pending drift '
                   f'adjudication (r14 verdict watch row: 2.0-2.7x on '
                   f'unchanged source under budget, no rerun fired — the '
                   f'r15 drift-rerun trigger closes the gap)')
        continue
    if name in reruns:
        t = reruns[name][1] / FACTOR  # (a): fold the solo time
        note = (f'driver r14 iso {t:.2f} (measured {reruns[name][0]:.2f} '
                f'rerun-dismissed as a load artifact)')
        iso_folds.append((name, t))
    else:
        t = per_query[name] / FACTOR
        note = f'driver r14 {t:.2f}'
    proposed = max(FLOOR, 2.5 * t)
    folded += 1
    if proposed > budget:
        governed.append((name, budget, round(proposed, 1), t))
        out.append(f'{prefix}{round(proposed, 1)}{sep}{comment}; {note} '
                   f'GOVERNS (2.5x ratchet from {budget})')
    else:
        out.append(f'{prefix}{budget_s}{sep}{comment}; {note} folds below '
                   f'the ratchet')
open("/root/repo/src/main/scala/graft/Budgets.scala", "w").write("\n".join(out))
print(f"folded {folded} rows; {len(governed)} governed:")
for g in governed:
    print(" ", g)
print("iso-folded (rerun-dismissed):", iso_folds)
print("excluded watch rows:", excluded)
print("no r14 sample (post-r14 queries):", absent)
