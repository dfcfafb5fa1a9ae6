#!/usr/bin/env python3
"""Merge split tools/check.py runs into one CORRECTNESS_sf1.json.

The sf1 gate runs check.py in parts (the 10 super-linear oracles get
their own invocations with a larger per-oracle cap so the 373 fast
replays are not serialized behind 300 s skip timers). Each part writes
a GRAFT_CHECK_JSON fragment; this merges them, recomputes the counts,
and records both timeouts. Pure artifact plumbing - no query logic.

usage: merge_sf1_gate.py out.json part1.json [part2.json ...]
"""
import json
import sys


def main():
    out, parts = sys.argv[1], sys.argv[2:]
    queries = {}
    meta = None
    timeouts = []
    for p in parts:
        d = json.load(open(p))
        if meta is None:
            meta = d
        timeouts.append(d.get("timeout_s", 0))
        queries.update(d.get("queries", {}))
    n_pass = sum(1 for v in queries.values() if v == "pass")
    n_fail = sum(1 for v in queries.values() if v in ("fail", "error"))
    n_skip = sum(1 for v in queries.values() if v == "slow_skip")
    json.dump({
        "sfdir": meta["sfdir"], "outdir": meta["outdir"],
        "mode": meta.get("mode", "hash"),
        "timeout_s": max(timeouts),
        "timeouts_per_part": timeouts,
        "n_pass": n_pass, "n_fail": n_fail, "n_slow_skip": n_skip,
        "queries": queries,
    }, open(out, "w"), indent=1)
    print(f"[merge] {out}: pass={n_pass} fail={n_fail} slow_skip={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
