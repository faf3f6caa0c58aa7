#!/usr/bin/env python3
"""Round-10 100x evidence: compare a fresh data/sf10 subset bench run
against the committed round-8 BENCH_100X.json per-query map and write
BENCH_100X_DELTA_r10.json with both numbers and the speedup — the
artifact the round-9 report promised but never committed.

Usage: tools/make_bench100x_delta.py <bench_log> <out>
"""
import json
import sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    line = None
    for ln in open(log, errors="replace"):
        if ln.startswith('{"metric"') and '"queries"' in ln:
            line = ln.strip()
    if line is None:
        raise SystemExit("no bench JSON line with queries found in " + log)
    bench = json.loads(line)
    r8 = json.load(open("BENCH_100X.json"))["queries_sec"]
    per = {}
    for q, t in sorted(bench["queries"].items()):
        prev = r8.get(q)
        per[q] = {
            "r8_100x_sec": prev,
            "r10_100x_sec": t,
            "speedup": round(prev / t, 2) if prev and t > 0 else None,
        }
    doc = {
        "sf_dir": "data/sf10",
        "scale_vs_sf01": 100,
        "protocol": "graft.Bench min-of-2 timed passes (pass 1 cold, pass 2 warm), local[32], 64g heap; r8 numbers from the committed BENCH_100X.json (same protocol)",
        "note": "subset run over the queries touched by rounds 9 and 10; untouched queries keep their BENCH_100X.json numbers",
        "n_queries": len(per),
        "failed": bench.get("failed", []),
        "total_sec_subset": bench.get("value"),
        "queries": per,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    ups = [v["speedup"] for v in per.values() if v["speedup"]]
    print("wrote", out, "n=", len(per),
          "geomean=", round(__import__("math").exp(
              sum(__import__("math").log(u) for u in ups) / len(ups)), 2)
          if ups else None)


if __name__ == "__main__":
    main()
