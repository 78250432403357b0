#!/usr/bin/env python3
"""Compare two bench artifacts' per-query medians (and jvm gc where present).
Usage: bench_diff.py BEFORE.json AFTER.json [threshold]"""
import json, sys

def load(p):
    d = json.load(open(p))
    return d

a, b = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
qa, qb = a["queries"], b["queries"]
ga, gb = a.get("jvm", {}), b.get("jvm", {})
common = sorted(set(qa) & set(qb), key=lambda k: -(float(qa[k])))
ta = sum(float(qa[k]) for k in common)
tb = sum(float(qb[k]) for k in common)
print(f"total (common {len(common)}q): {ta:.1f}s -> {tb:.1f}s  ({tb/ta:.3f}x)")
print(f"{'query':42s} {'before':>8s} {'after':>8s} {'ratio':>6s} {'gc_b':>7s} {'gc_a':>7s}")
shown = 0
for k in common:
    va, vb = float(qa[k]), float(qb[k])
    r = vb / max(va, 1e-9)
    if (r > thr or r < 1 / thr) and max(va, vb) > 0.3:
        gca = ga.get(k, [0])[0]; gcb = gb.get(k, [0])[0]
        print(f"{k:42s} {va:8.2f} {vb:8.2f} {r:6.2f} {gca:6d}ms {gcb:6d}ms")
        shown += 1
print(f"({shown} queries beyond {thr}x either way)")
only_b = set(qb) - set(qa)
if only_b: print("new in after:", sorted(only_b))
