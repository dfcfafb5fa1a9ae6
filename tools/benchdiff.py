#!/usr/bin/env python3
"""Round-over-round bench comparison with GC attribution.

usage: benchdiff.py OLD.json NEW.json [threshold_sec]

Reads two full bench_out.json files (the 3-dp per-query map Bench
writes, with the per-query "gc" seconds map) and prints queries whose
time moved more than `threshold_sec` (default 0.3), flagging rows
where the GC delta explains the move — the round-4 lesson: a
contiguous alphabetical cluster of regressions with no code change is
machine load, not a plan regression, and must be shown, not assumed.
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    oq, nq = old["queries"], new["queries"]
    ogc, ngc = old.get("gc", {}), new.get("gc", {})
    rows = []
    for k in sorted(set(oq) & set(nq)):
        d = nq[k] - oq[k]
        if abs(d) >= thr:
            gcd = ngc.get(k, 0.0) - ogc.get(k, 0.0)
            note = "gc-explained" if abs(gcd) >= abs(d) * 0.5 else ""
            rows.append((d, k, oq[k], nq[k], gcd, note))
    for d, k, a, b, gcd, note in sorted(rows):
        print(f"{d:+7.3f}s  {k:34s} {a:7.3f} -> {b:7.3f}  gcΔ {gcd:+6.3f}  {note}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new queries:", ", ".join(f"{k}={nq[k]}" for k in only_new))
    print(f"total: {old['value']} -> {new['value']} "
          f"({len(set(oq) & set(nq))} shared, {len(only_new)} new)")


if __name__ == "__main__":
    main()
