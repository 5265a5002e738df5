"""Quick host-phase probe: is this a quiet window worth benchmarking in?

Two 10-second readings, printed as one JSON line:
- the pure-CPU multiprocessing envelope at 1/8/32 processes (the same
  estimator the scaling bench uses — Mops of an integer burn), and
- a tiny Arrow round-trip rate (pandas-UDF worker throughput), because
  this host's degraded phases hit Python/Arrow workers hardest (see
  BENCH_REEVIDENCE_r05.json: signature kernel and ANN GEMM walls ran
  2-5x while pure-JVM stages barely moved).

Compare against the quiet-window reference stamped below before
trusting any new wall-clock number. Usage: python tools/host_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# measured in the round-5 degraded phase (for contrast) and the best
# windows seen this project; update when a new quiet window is observed
REFERENCE = {
    "quiet_mops_32": 315.3,       # scaling run H envelope (clean probe)
    "degraded_fullconfig_120k_sec": "117-257 (r05 spread)",
    "quiet_fullconfig_120k_sec": "95-111 (r04)",
}


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def envelope() -> dict[str, float]:
    out = {}
    for procs in (1, 8, 32):
        n = 2_000_000
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(_burn, [n] * procs * 2)
        out[str(procs)] = round(procs * 2 * n / (time.monotonic() - t0) / 1e6, 1)
    return out


def arrow_rate() -> float:
    """Rows/sec through one pandas-UDF worker round-trip (small, warm)."""
    from pyspark.sql import functions as F

    from gnames_spark.functions.shingles import token_hashes
    from gnames_spark.session import get_spark

    spark = get_spark(app_name="host_probe", master="local[4]",
                      shuffle_partitions=4)
    df = spark.range(20000).select(
        F.concat(F.lit("probe text body "), F.col("id")).alias("text")
    )
    df.select(token_hashes("text")).count()  # warm the workers
    t0 = time.monotonic()
    df.select(token_hashes("text")).count()
    secs = time.monotonic() - t0
    spark.stop()
    return round(20000 / secs, 1)


def main() -> int:
    print(json.dumps({
        "envelope_mops": envelope(),
        "arrow_rows_per_sec": arrow_rate(),
        "reference": REFERENCE,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
