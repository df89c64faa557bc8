#!/usr/bin/env python
"""Assemble BENCH/scaling_summary.json from the round-6 capture logs:

- parity_corpus: min-merge per query per side across N ``bench.py
  --scaling`` runs (the r5 VERDICT #2 'interleaved min-merged parity
  walls' protocol), efficiency recomputed from min-merged totals.
- big_raster / big_raster_zrep2048 / big_dedup / knn_big: the MERGED
  lines from tools/scaling_pairs_r5.py (already min-merged, 3 pairs).
- shared_spans_standalone: min across the interleaved probe runs.

Inputs are the session capture logs; paths hardcoded for the round-6
session (re-run captures before re-running this)."""
from __future__ import annotations

import json
import re
import sys
import time

SUMMARY = "BENCH/scaling_summary.json"


def parse_baseline_tables(paths):
    """Per-query (lo, hi) walls from saved BASELINE.md tables."""
    runs = []
    for p in paths:
        rows = {}
        for ln in open(p):
            m = re.match(r"\| (\w+) \| ([0-9.]+) \| ([0-9.]+) \|", ln)
            if m:
                rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))
        if rows:
            runs.append(rows)
    return runs


def main() -> None:
    parity_tables = parse_baseline_tables(sys.argv[1:])
    assert parity_tables, "pass the saved per-run BASELINE.md paths"
    merged = {}
    for q in parity_tables[0]:
        lo = min(t[q][0] for t in parity_tables)
        hi = min(t[q][1] for t in parity_tables)
        merged[q] = (lo, hi)
    lo_tot = sum(v[0] for v in merged.values())
    hi_tot = sum(v[1] for v in merged.values())

    summ = json.load(open(SUMMARY))
    # keep the ceilings the live runs measured; only replace walls/effs
    parity = summ.get("parity_corpus", {})
    parity.update(
        cpus=[2, 8],
        efficiency=round((lo_tot / hi_tot) / 4.0, 3),
        per_query={q: round((lo / hi) / 4.0, 3)
                   for q, (lo, hi) in merged.items()},
        per_query_walls={q: {"lo_sec": round(lo, 2),
                             "hi_sec": round(hi, 2)}
                         for q, (lo, hi) in merged.items()},
        pairs_min_merged=len(parity_tables),
        note=("round-6 capture, min-merged across "
              f"{len(parity_tables)} interleaved --scaling runs (the r5 "
              "VERDICT #2 protocol promoted to the parity corpus).  The "
              "r6 optimizations cut the heavy rows' absolute walls 1.5-3x "
              "(see OPTIMIZATION_r06.md), which drops several small rows "
              "(zonal, knn, dup_clusters, dedup_blocks, extract) fully "
              "into the scheduler-latency regime at HEAVY=3/local[2] "
              "(<8 s walls both sides) — their per-query efficiencies "
              "read launch latency, not operator scaling; the rows that "
              "still carry >10 s of compute read 0.66-1.33."),
        measured_unix=int(time.time()))
    summ["parity_corpus"] = parity
    json.dump(summ, open(SUMMARY, "w"), indent=1)
    print(json.dumps(parity["per_query"], indent=1))
    print("overall", parity["efficiency"])


if __name__ == "__main__":
    main()
