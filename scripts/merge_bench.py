#!/usr/bin/env python3
"""Min-merge two (or more) full Bench artifacts into BENCH_LOCAL.json.

Per-query headline = MIN across runs (each run is already min-of-N);
rep vectors / builds / calibration triples are CONCATENATED across runs
so the committed anchor keeps full spike-vs-sustained attribution;
retimed keeps the per-query min. The summary fields (value/median/
over_1s) are recomputed from the merged per-query mins.

Usage: merge_bench.py out.json run1.json run2.json [...]
"""
import json
import statistics
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    runs = [json.load(open(p)) for p in ins]
    base = runs[0]
    # UNION of key sets across runs: iterating only the first run's keys
    # silently dropped any query added between runs from the merged totals
    queries = {}
    for k in sorted(set().union(*(r["queries"] for r in runs))):
        vals = [r["queries"][k] for r in runs if k in r["queries"]]
        queries[k] = min(vals)
    rep_keys = sorted(set().union(*(r.get("reps", {}) for r in runs)))
    reps = {k: sum((r.get("reps", {}).get(k, []) for r in runs), [])
            for k in rep_keys}
    build_keys = sorted(set().union(*(r.get("builds", {}) for r in runs)))
    builds = {k: sum((r.get("builds", {}).get(k, []) for r in runs), [])
              for k in build_keys}
    cal = sum((r.get("cal", []) for r in runs), [])
    cal_end = sum((r.get("cal_end", []) for r in runs), [])
    retimed = {}
    for r in runs:
        for k, v in r.get("retimed", {}).items():
            # round-21 runs emit {query: [graded, retimed]}; earlier
            # artifacts a bare retime scalar — normalize to the retime
            rv = v[1] if isinstance(v, list) else v
            retimed[k] = min(rv, retimed.get(k, rv))
    vals = sorted(queries.values())
    merged = {
        "metric": "total",
        "value": sum(vals),
        "unit": "sec",
        "sf": base["sf"],
        "n_queries": len(queries),
        "median": statistics.median(vals),
        "over_1s": sum(1 for v in vals if v >= 1.0),
        "runs_merged": len(runs),
        "cal": cal,
        "cal_end": cal_end,
        "retimed": retimed,
        "builds": builds,
        "reps": reps,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"{out}: total {sum(vals):.1f}s over {len(queries)} queries "
          f"(median {statistics.median(vals):.3f}, cal min "
          f"{min(cal) if cal else -1:.3f})")


if __name__ == "__main__":
    main()
