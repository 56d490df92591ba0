"""Throughput/latency frontier: run bench.py across operating points on the real TPU.

BASELINE.json's north-star metric is queries/sec/chip AND p50 episode latency — a
single throughput point hides the tradeoff (r3 bought 5.6 q/s at p50 12.7 s vs 4.4
q/s at 7.0 s). This sweeps the operating points and writes frontier.json + a
markdown table for BASELINE.md.

Usage: python scripts/frontier.py [--quick]   (~15 min per point; compiles cached
across points only where shapes match, so expect the first run of each batch size
to pay the compile bill)
"""

import argparse
import json
import os
import subprocess
import sys
import time

CONFIGS = [
    # latency-optimized: no pipelining, episode latency == its wave's wall time
    ("wave-32-lat", {"BENCH_BATCH": "32", "BENCH_PIPELINE": "0"}),
    ("wave-48-lat", {"BENCH_BATCH": "48", "BENCH_PIPELINE": "0"}),
    ("wave-64-lat", {"BENCH_BATCH": "64", "BENCH_PIPELINE": "0"}),
    # big batches: weights amortize (decode floor 4.2 ms/step is batch-independent);
    # split-row prefill + attend_len reads (r4) shrink the footprint that OOM'd 96
    ("wave-96-lat", {"BENCH_BATCH": "96", "BENCH_PIPELINE": "0"}),
    ("wave-96-lat-prefix", {"BENCH_BATCH": "96", "BENCH_PIPELINE": "0",
                            "BENCH_PREFIX_KV": "1"}),
    # throughput-optimized: PAIR-pipelined waves (stage-1 decode of wave n co-batched
    # with stage-2 decode of wave n-1; two resident KV caches)
    ("wave-48-pair", {"BENCH_BATCH": "48", "BENCH_PREFIX_KV": "0"}),
    # + per-image [sys+image] KV-prefix cache (reference image-first prompt layout;
    # the bench DEFAULT = pair + prefix). Batch-64 pair was a measured OOM with
    # dummy edges (third full 64x1536 cache past 15.75 GB HBM at the solo-tail
    # dispatch); solo bootstrap/drain edges (pipeline.py edges="solo", the
    # automatic bench choice at batch >= 64) cap residency at two caches.
    ("wave-48-pair-prefix", {"BENCH_BATCH": "48"}),  # shipping default
    ("wave-64-pair-prefix", {"BENCH_BATCH": "64"}),
    # A/B: plain pipelining without the pair co-batch (isolates the pair gain)
    ("wave-48-pipelined", {"BENCH_BATCH": "48", "BENCH_PAIR": "0"}),
    ("wave-64-pipelined", {"BENCH_BATCH": "64", "BENCH_PAIR": "0"}),
    # production continuous-batching engine (per-episode latencies, slot backfill);
    # 64 slots is a measured COMPILE-time OOM (pool prefill 64x768 wants 17.7 GB)
    ("engine-48", {"BENCH_BATCH": "48", "BENCH_MODE": "engine"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated config names")
    ap.add_argument("--out", default="frontier.json")
    args = ap.parse_args()
    rows = []
    for name, env in CONFIGS:
        if args.only and name not in args.only.split(","):
            continue
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        e = dict(os.environ)
        e.update(env)
        # each row must be the config it claims: without this an OOM point would
        # silently ladder down (bench.py _fallback_ladder) and report a DIFFERENT
        # mode's number under this row's name
        e["BENCH_NO_RETRY"] = "1"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"], env=e, capture_output=True, text=True,
            timeout=3600,
        )
        wall = time.time() - t0
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            print(f"{name}: FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            rows.append({"config": name, "error": proc.returncode})
            rec = json.loads(line) if line else {}
            if rec.get("error") == "backend_unavailable":
                # dead tunnel fails every remaining point identically — stop the
                # sweep instead of paying the probe timeout once per config
                print("frontier: backend unavailable — aborting sweep", file=sys.stderr)
                break
            continue
        rec = json.loads(line)
        rec["config"] = name
        rec["wall_s"] = round(wall, 1)
        rows.append(rec)
        print(f"{name}: {rec['value']} q/s  p50={rec.get('p50_latency_s')}s "
              f"p95={rec.get('p95_latency_s')}s  ({wall:.0f}s wall)", flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    # markdown table for BASELINE.md
    print("\n| config | q/s/chip | vs baseline | p50 (s) | p95 (s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['config']} | FAILED | | | |")
        else:
            print(f"| {r['config']} | {r['value']} | {r['vs_baseline']}x "
                  f"| {r.get('p50_latency_s')} | {r.get('p95_latency_s')} |")


if __name__ == "__main__":
    main()
