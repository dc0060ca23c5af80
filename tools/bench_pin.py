#!/usr/bin/env python3
"""Combine >=3 full Bench runs into a MEDIAN-pinned record (r15 judge
item 1c: a best-of-N pin is the optimistic tail of the run band and the
driver's single run is the pessimistic tail; the median is the honest
center, and the band itself belongs in the record).

Usage:  python3 tools/bench_pin.py BENCH_run1.json BENCH_run2.json ... > BENCH_full.json

Output: the full-fidelity JSON of the run whose wall-clock is the
median, with extra fields:
  pin_mode        "median_of_N"
  run_walls       per-run suite wall-clock seconds (the band)
  run_query_sums  per-run sum of sequential per-query seconds
  queries         per-query MEDIAN seconds across runs
  queries_best    per-query MIN seconds across runs (the old pin, kept
                  for continuity with r<=15 records)
"""
import json, statistics, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert len(runs) >= 3, "median pin needs >= 3 full runs"
# An even run count would make statistics.median interpolate between two
# runs, so the pinned wall would match no actual run (r16 ADVICE); with
# odd N the base record IS the median run and the wall is its wall.
assert len(runs) % 2 == 1, "median pin needs an ODD run count"
for r in runs:
    assert not r.get("suite_filter"), "refusing to pin a filtered run"
    assert r.get("errors") == {}, f"run has errors: {r['errors']}"

walls = [r["value"] for r in runs]
names = set(runs[0]["queries"])
for r in runs[1:]:
    assert set(r["queries"]) == names, "runs cover different query sets"

med = {n: round(statistics.median(r["queries"][n] for r in runs), 3)
       for n in sorted(names)}
best = {n: round(min(r["queries"][n] for r in runs), 3)
        for n in sorted(names)}
qsums = [round(sum(r["queries"].values()), 3) for r in runs]

# base record = the run at the median wall (its errors/transients/shared
# lists describe a real run, not a synthetic average); with the odd-N
# assert above, statistics.median(walls) == base["value"] exactly.
base = sorted(runs, key=lambda r: r["value"])[len(runs) // 2]
out = dict(base)
out["queries"] = med
out["queries_best"] = best
out["pin_mode"] = f"median_of_{len(runs)}"
# run_walls / run_query_sums stay in ORIGINAL run order (argv order) so
# the two lists correlate per run (r16 ADVICE: sorting them independently
# lost which query-sum belonged to which wall).
out["run_walls"] = [round(w, 3) for w in walls]
out["run_query_sums"] = qsums
out["value"] = round(statistics.median(walls), 3)
json.dump(out, sys.stdout, separators=(",", ":"))
print()
