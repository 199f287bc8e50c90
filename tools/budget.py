#!/usr/bin/env python3
"""Build tools/bench_budget.json from N bench_out JSON files.

Usage: python3 tools/budget.py out1.json out2.json out3.json

Writes per-query MEDIANS of wall ("wall"), job count ("jobs") and
executor CPU seconds ("cpuSec") in the nested form graft.Bench reads
(the retry trigger uses "wall"; jobs/cpuSec make BASELINE.md's reading
rules — jobs up = plan change, cpu up = regression — mechanically
checkable). Also prints a markdown table for the BASELINE.md round
section, sorted by median wall descending.

Run the inputs with SPARK_GRAFT_BENCH_BUDGET=/dev/null so no retry
(which releases family caches since round 9) perturbs the samples.
"""
import json
import statistics
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert len(runs) >= 1, "need at least one bench_out.json"
names = sorted(runs[0]["queries"].keys())
for r in runs:
    assert sorted(r["queries"].keys()) == names, "runs cover different query sets"
    assert not r.get("errors"), f"run has errors: {r['errors']}"

budget = {
    "_comment": "per-query medians at sf0.1 local[32] of "
    f"{len(runs)} clean runs (retries disabled via "
    "SPARK_GRAFT_BENCH_BUDGET=/dev/null); Bench retries any query whose "
    "wall exceeds K x wall; jobs/cpuSec back BASELINE.md's reading rules",
}
if all("calibCpuSec" in r for r in runs):
    # idle-machine cost of the bench's CPU-calibration probe — the
    # denominator for environment attribution of inflated cpu readings
    budget["_calibCpuSec"] = round(
        statistics.median(r["calibCpuSec"] for r in runs), 3)
for n in names:
    budget[n] = {
        "wall": round(statistics.median(r["queries"][n] for r in runs), 3),
        "jobs": int(statistics.median(r["jobs"][n] for r in runs)),
        "cpuSec": round(statistics.median(r["cpuSec"][n] for r in runs), 3),
    }
    # per-entry cache-block-write expectation (round 14): the
    # eviction/recompute signature (writes above budget at flat jobs)
    # becomes mechanically checkable from the driver artifact alone —
    # Bench flags first samples above 2x budget + 8 in writesOverBudget
    if all("rddWrites" in r for r in runs):
        budget[n]["rddWrites"] = int(
            statistics.median(r["rddWrites"][n] for r in runs))

with open("tools/bench_budget.json", "w") as f:
    json.dump(budget, f, indent=1)
    f.write("\n")

rows = sorted(names, key=lambda n: -budget[n]["wall"])
total = sum(budget[n]["wall"] for n in names)
print(f"total of medians: {total:.1f} s over {len(names)} queries")
print(f"run totals: {[round(r['value'], 1) for r in runs]}")
print()
print("| query | sec | jobs | cpuSec | | query | sec | jobs | cpuSec |")
print("|---|---|---|---|---|---|---|---|---|")
half = (len(rows) + 1) // 2
for i in range(half):
    left = rows[i]
    l = f"| {left} | {budget[left]['wall']} | {budget[left]['jobs']} | {budget[left]['cpuSec']} |"
    if i + half < len(rows):
        right = rows[i + half]
        l += f" {right} | {budget[right]['wall']} | {budget[right]['jobs']} | {budget[right]['cpuSec']} |"
    else:
        l += "  |  |  |  |"
    print(l)
