#!/usr/bin/env python3
"""Merge N clean full-sweep summaries into the re-anchored per-query
gate file (VERDICT r20 task 7): per query the MEDIAN of the runs'
medians, stamped with each run's canary_ratio so the anchor window's
own noise is part of the record. Output is one-line JSON with a
"queries":{...} block in exactly the shape graft.Bench.readLastRunQueries
parses (BenchSpec pins that).

Usage: tools/make_gate.py OUT run1.json run2.json [run3.json ...]
"""
import json
import statistics
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    for p, r in zip(paths, runs):
        if r.get("rc") != 0 or r.get("errors"):
            raise SystemExit(f"{p}: not a clean run (rc={r.get('rc')})")
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])
    gate = {
        "metric": "baseline_gate",
        "unit": "sec",
        "protocol": "median of %d clean full sweeps (each per-query "
                    "median-of-3, sf0.1, local[32]); the <=2x per-query "
                    "gate anchors here from r20 on" % len(runs),
        "runs": len(runs),
        "canary_ratios": [r.get("canary_ratio") for r in runs],
        "queries": {
            n: round(statistics.median(r["queries"][n] for r in runs), 3)
            for n in sorted(names)
        },
    }
    with open(out, "w") as f:
        f.write(json.dumps(gate, separators=(",", ":")) + "\n")
    print(f"{out}: {len(names)} queries, canaries "
          f"{gate['canary_ratios']}")


if __name__ == "__main__":
    main()
