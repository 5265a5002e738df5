"""Measure ANN recall vs the exact blocked all-pairs path.

Runs `blocked_cosine_pairs` (exact ground truth) and `ann_dup_pairs`
(multi-probe sign-LSH) over the embeddings table, reporting recall and
candidate-volume reduction per probe count — the embedding analog of
the LSH-banding catch-probability analysis in config.py. Writes
ANN_RECALL.json.

Usage: python tools/ann_recall.py [sf_dir] [threshold]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox-only shuffle scratch

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gnames_spark.operators.embeddings import ann_dup_pairs, blocked_cosine_pairs  # noqa: E402
from gnames_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = get_spark(app_name="ann_recall", shuffle_partitions=16)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])

    t0 = time.monotonic()
    exact = {
        (r["id_a"], r["id_b"])
        for r in blocked_cosine_pairs(emb, threshold, n_blocks=8).collect()
    }
    exact_secs = time.monotonic() - t0

    report = {
        "sf_dir": sf_dir,
        "threshold": threshold,
        "n_vectors": n,
        "dim": dim,
        "exact_pairs": len(exact),
        "exact_secs": round(exact_secs, 2),
        "probes": [],
    }
    all_seeds = (42, 1042, 2042, 3042, 4042)
    for k in (1, 3, 5):
        seeds = all_seeds[:k]
        t0 = time.monotonic()
        got = {
            (r["id_a"], r["id_b"])
            for r in ann_dup_pairs(emb, threshold, dim, n_bits=12, seeds=seeds).collect()
        }
        secs = time.monotonic() - t0
        recall = (len(got & exact) / len(exact)) if exact else 1.0
        report["probes"].append(
            {
                "n_probes": k,
                "recall": round(recall, 4),
                "found_pairs": len(got),
                "secs": round(secs, 2),
            }
        )
        print(f"probes={k} recall={recall:.4f} pairs={len(got)}/{len(exact)} [{secs:.1f}s]")

    with open("ANN_RECALL.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote ANN_RECALL.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
