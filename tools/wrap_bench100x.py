#!/usr/bin/env python3
"""Wrap the graft.Bench JSON line from a data/sf10 run into
BENCH_100X.json with the run's metadata and the sf0.1 per-query
comparison (ratio map), so the artifact is self-describing.

Usage: tools/wrap_bench100x.py <bench_log> <sf01_bench_queries.json> <out>
"""
import json
import sys


def main():
    log, sf01_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    line = None
    for ln in open(log, errors="replace"):
        if ln.startswith('{"metric"'):
            line = ln.strip()
    if line is None:
        raise SystemExit("no bench JSON line found in " + log)
    bench = json.loads(line)
    sf01 = json.load(open(sf01_path))
    queries = bench["queries"]
    ratios = {}
    for q, t in queries.items():
        base = sf01.get(q)
        if base and base > 0 and t > 0:
            ratios[q] = round(t / base, 2)
    doc = {
        "sf_dir": "data/sf10",
        "scale_vs_sf01": 100,
        "protocol": "graft.Bench min-of-2 timed passes after untimed warmup, local[32], 64g heap",
        "excluded": {
            "q224_minhash_calibration": "candidate-pair replication pathology at 100x (verbatim-copy test data); verified at 10x/30x",
            "q225_simhash_calibration": "same pathology family; verified at 10x/30x",
        },
        "n_queries": len(queries),
        "failed": bench.get("failed", []),
        "total_sec": bench.get("value"),
        "queries_sec": queries,
        "ratio_vs_sf01": ratios,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    ok = [v for v in queries.values() if v >= 0]
    print("wrote", out, "n=", len(queries), "total=", round(sum(ok), 1),
          "failed=", bench.get("failed", []))


if __name__ == "__main__":
    main()
