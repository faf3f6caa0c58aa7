#!/usr/bin/env python3
"""Round-8 BENCH_100X.json update: fold in the rep-collapse re-plans
(q35/q224/q225/q257) and the q442 first 100x measurement, measured via
same-protocol subset runs (fresh 64g local[32] JVM, min-of-2 passes,
pass 1 as warmup), with same-session sf0.1 re-bench ratio bases.

Usage: tools/update_bench100x_r8.py  (edits BENCH_100X.json in place)
"""
import json

# (name, sec_100x, sec_sf01_same_session)
MEASURED = {
    "q35_lsh_neardup_pairs": (7.900, 0.659),
    "q224_minhash_calibration": (1.086, 1.308),
    "q225_simhash_calibration": (11.552, 3.531),
    "q257_dedup_threshold_curve": (2.678, 2.878),
    "q442_markov_attribution": (38.737, 20.153),
}

NOTE = (
    "r8 rep-collapse re-plans: the four dedup-calibration queries were the "
    "r7 'weak' cohort (quadratic candidate pairs in duplicate mass on the "
    "verbatim-replicated ScaleUp corpus; q35 477x / q257 432x, q224/q225 "
    "excluded). Re-planned on the shared RepIndex (unfiltered rep-level "
    "candidate stats + membership): q224/q225/q257 aggregate rep pairs "
    "with multiplicity |A|*|B| (+ C(c,2) same-group pairs) so the pair "
    "stage is linear in duplicate mass; q35 recovers its pair OUTPUT by "
    "pure id expansion (O(1) work per output row; the output itself is "
    "inherently quadratic in duplicate mass). Measured same-protocol at "
    "100x vs same-session sf0.1: q35 7.90 s (ratio 12.0x, was 695 s), "
    "q224 1.09 s (0.8x), q225 11.55 s (3.3x, simhash corpus pass is the "
    "linear cost), q257 2.68 s (0.9x, was 671 s). Correctness evidence: "
    "all four hash-exact vs DuckDB at sf0.001/sf0.01/sf0.1 AND at 10x "
    "(data/sf1, canonical bitwise tool), and RepCollapseSpec pins each "
    "re-plan EQUAL to the original doc-level pipeline on a "
    "duplicate-heavy planted corpus (groups of 5-9 copies, both id "
    "orientations). The 100x DuckDB oracle for this cohort is "
    "machine-infeasible, honestly: the DOC-LEVEL oracle SQL must "
    "materialize the quadratic candidate set (25M+ pairs x shingle "
    "joins), and two attempts filled the box's 77 GB of free disk with "
    "DuckDB spill before completing - the exact pathology the re-plan "
    "removes from the engine side. q442 (Markov removal-effect "
    "attribution, added late in r7) measured 38.74 s at 100x vs 20.15 s "
    "same-session sf0.1 (1.9x), hash-exact at 10x AND at 100x (the 100x "
    "DuckDB recursion ran 110 minutes to confirm the match) - every "
    "registry query now carries 100x evidence."
)


def main():
    d = json.load(open("BENCH_100X.json"))
    for q, (t100, t01) in MEASURED.items():
        old = d["queries_sec"].get(q)
        d["queries_sec"][q] = t100
        d["ratio_vs_sf01"][q] = round(t100 / t01, 2)
        print(f"{q}: {old} -> {t100} (ratio {t100 / t01:.2f})")
    d["excluded"] = {}
    d["n_queries"] = len(d["queries_sec"])
    d["total_sec"] = round(sum(d["queries_sec"].values()), 2)
    d["rerun_notes"]["r8_repcollapse_and_q442"] = NOTE
    json.dump(d, open("BENCH_100X.json", "w"), indent=1)
    print("n_queries", d["n_queries"], "total_sec", d["total_sec"])


if __name__ == "__main__":
    main()
