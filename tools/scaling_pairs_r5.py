"""Run N interleaved local[2]/local[8] big-raster bench pairs + a CPU
calibration per pair, min-merge per-query secs across pairs, and print the
scaling table (the BENCH/BASELINE.md protocol — bench.py --scaling-big
only does single pairs and appends duplicate sections).

Usage: python tools/scaling_pairs_r5.py [n_pairs] [--config big|dedup]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(cpus: int, config: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_TRIALS="1")
    if config == "big":
        env["SPARK_GRAFT_BENCH_BIG"] = "1"
    elif config == "dedup":
        env["SPARK_GRAFT_BENCH_DEDUP_BIG"] = "1"
    elif config == "knn":
        env["SPARK_GRAFT_BENCH_KNN_BIG"] = "1"
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                       "--child"], capture_output=True, text=True, env=env,
                       cwd=REPO)
    for ln in p.stdout.splitlines():
        if ln.startswith("CHILD_JSON:"):
            return json.loads(ln[len("CHILD_JSON:"):])
    raise SystemExit(f"child local[{cpus}] failed: {p.stderr[-800:]}")


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    config = "big"
    if "--config" in sys.argv:
        config = sys.argv[sys.argv.index("--config") + 1]
    sys.path.insert(0, REPO)
    import bench
    pairs = []
    cals = []
    for i in range(n_pairs):
        cals.append(bench.cpu_calibration(2, 8))
        lo = run_child(2, config)
        hi = run_child(8, config)
        pairs.append((lo, hi))
        print(f"pair {i}: " + json.dumps({
            "lo": {k: round(v["sec"], 2) for k, v in lo["queries"].items()},
            "hi": {k: round(v["sec"], 2) for k, v in hi["queries"].items()},
            "cal": cals[-1]}), flush=True)
    qnames = list(pairs[0][0]["queries"])
    merged = {}
    for q in qnames:
        lo_min = min(p[0]["queries"][q]["sec"] for p in pairs)
        hi_min = min(p[1]["queries"][q]["sec"] for p in pairs)
        eff = (lo_min / hi_min) / (8 / 2)
        merged[q] = {"lo_sec": round(lo_min, 2), "hi_sec": round(hi_min, 2),
                     "efficiency": round(eff, 3)}
    lo_tot = sum(m["lo_sec"] for m in merged.values())
    hi_tot = sum(m["hi_sec"] for m in merged.values())
    print("MERGED:" + json.dumps({
        "config": config, "pairs": n_pairs, "per_query": merged,
        "overall_efficiency": round((lo_tot / hi_tot) / 4.0, 3),
        "machine_ceiling": round(max(c["ceiling"] for c in cals), 3),
        "stream_ceiling": round(max(c["stream_ceiling"] for c in cals), 3),
        "measured_unix": int(time.time())}), flush=True)


if __name__ == "__main__":
    main()
