"""Scaling-efficiency evidence: same job, same input, local[N] vs local[4N].

The BASELINE gate ("throughput scaling efficiency >= 0.8 between N and
4N executors") cannot use a real cluster in this sandbox; per driver
instruction we run the identical job at two parallelism levels in
separate JVMs and report throughput at both plus efficiency
(= speedup / 4) into BENCH_SCALING.json and BENCH.md.

The job is the CPU-bound core of the pipeline — signatures (MinHash 128
perms + SimHash over Arrow batches) + LSH banding + bucket self-join +
exact-Jaccard verification + connected components — over a
deterministically generated synthetic corpus large enough that task
work dominates scheduling (default 60k pages ≈ 18M shingles).

Usage: python tools/scaling_bench.py [n_docs] [small_cores] [big_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER = r"""
import sys, time, json
sys.path.insert(0, ".")
from gnames_spark.session import get_spark
from gnames_spark.config import DedupConfig
from gnames_spark.corpus import generate_pages
from gnames_spark.pipeline import DedupPipeline

n_docs, cores = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(cores * 2, 8))
cfg = DedupConfig(shuffle_partitions=max(cores * 2, 8))
pages = generate_pages(spark, n_docs, seed=42, partitions=max(cores * 2, 8))
pages = pages.drop("html")  # isolate the signature/join core; extraction
                            # scales embarrassingly and would flatter the number
pages.cache().count()       # corpus gen off the clock
t0 = time.monotonic()
pipe = DedupPipeline(spark, cfg, enable_substring=False)
res = pipe.run(pages)
n_comp = res["components"].count()
secs = time.monotonic() - t0
print(json.dumps({"cores": cores, "secs": round(secs, 2),
                  "docs_per_sec": round(n_docs / secs, 1),
                  "n_components": n_comp}))
spark.stop()
"""


def run_level(n_docs: int, cores: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_docs), str(cores)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"worker at local[{cores}] produced no result")
    return json.loads(last[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    # interleave trials and take the min per level: this box is a shared
    # VM with heavy run-to-run noise (identical 8-core jobs measured
    # 49.8s and 109.9s an hour apart); min-of-interleaved is the
    # standard noisy-host protocol
    runs_small, runs_big = [], []
    for t in range(trials):
        runs_small.append(run_level(n_docs, small))
        runs_big.append(run_level(n_docs, big))
    r_small = min(runs_small, key=lambda r: r["secs"])
    r_big = min(runs_big, key=lambda r: r["secs"])
    speedup = r_small["secs"] / r_big["secs"]
    efficiency = speedup / (big / small)
    out = {
        "job": "dedup core (signatures + LSH + simhash + verify + components)",
        "n_docs": n_docs,
        "trials": trials,
        "small": r_small,
        "big": r_big,
        "all_small_secs": [r["secs"] for r in runs_small],
        "all_big_secs": [r["secs"] for r in runs_big],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "identical_output": r_small["n_components"] == r_big["n_components"],
    }
    print(json.dumps(out, indent=1))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
