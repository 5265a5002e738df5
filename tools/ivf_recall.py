"""Measure IVF top-k recall vs brute force on a CLUSTERED corpus.

The sf embeddings table is near-isotropic — IVF's worst case (cells
can't adapt to structure that isn't there; recall ≈ scan fraction
plus a small margin, and the driver query emb_ivf_topk documents
that). Real embedding corpora cluster, and that is the corpus shape
this tool measures: ``n_clusters`` seeded gaussian centers, vectors
drawn around them, plus an isotropic noise fraction so cells aren't
trivially pure.

Ground truth = ``cosine_topk`` (exact brute force) for a deterministic
query sample; measured = ``ivf_topk`` at a sweep of ``nprobe`` values
with ``derive_ivf_cells``-derived cell count. Scan fraction = mean
candidates scored per query / corpus size — the efficiency claim
(recall >> scan fraction is what "data-adaptive" buys; on isotropic
data they collapse together).

Updates the ``ivf_topk`` key of ANN_RECALL.json in place (the sign-LSH
sections are ann_recall.py's). Usage:

    python tools/ivf_recall.py [n_vectors] [n_clusters] [k]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox-only shuffle scratch

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gnames_spark.operators.embeddings import cosine_topk  # noqa: E402
from gnames_spark.operators.ivf import (  # noqa: E402
    build_ivf_index,
    derive_ivf_cells,
    ivf_topk,
    train_ivf_centroids,
)
from gnames_spark.session import get_spark  # noqa: E402

DIM = 64
NOISE_FRAC = 0.1
QUERY_STRIDE = 40  # every 40th vector is a query → n/40 queries


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="ivf_recall", shuffle_partitions=32)

    rng = np.random.RandomState(13)
    centers = rng.standard_normal((n_clusters, DIM)) * 3.0
    n_noise = int(n * NOISE_FRAC)
    rows = []
    for i in range(n - n_noise):
        v = centers[i % n_clusters] + rng.standard_normal(DIM) * 0.8
        rows.append((i, [float(x) for x in v]))
    for i in range(n - n_noise, n):
        rows.append((i, [float(x) for x in rng.standard_normal(DIM)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    corpus.count()
    queries = corpus.filter(F.col("vec_id") % QUERY_STRIDE == 0).persist()
    n_queries = queries.count()

    t0 = time.monotonic()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(queries, corpus, k=k).collect()
    }
    exact_secs = time.monotonic() - t0

    n_cells = derive_ivf_cells(n)
    t0 = time.monotonic()
    centroids = train_ivf_centroids(corpus, DIM, n_cells, seed=7)
    train_secs = time.monotonic() - t0
    postings, _ = build_ivf_index(corpus, centroids)
    cell_sizes = {r["cell"]: r["n"] for r in postings.groupBy("cell").agg(F.count("*").alias("n")).collect()}

    section = {
        "corpus": "synthetic clustered (seeded): "
                  f"{n_clusters} gaussian centers + {NOISE_FRAC:.0%} isotropic noise",
        "n_vectors": n,
        "dim": DIM,
        "k": k,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "train_secs": round(train_secs, 2),
        "max_cell_frac": round(max(cell_sizes.values()) / n, 4),
        "exact_secs": round(exact_secs, 2),
        "sweeps": [],
    }
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.monotonic()
        got_df, _ = ivf_topk(corpus, queries, k=k, centroids=centroids, nprobe=nprobe)
        got = {(r["query_id"], r["neighbor_id"]) for r in got_df.collect()}
        secs = time.monotonic() - t0
        recall = len(got & truth) / len(truth) if truth else 1.0
        # candidates scored per query = sum of its probed cells' sizes
        probed = sorted(cell_sizes.values(), reverse=True)[:nprobe]
        scan_frac_worst = sum(probed) / n
        scan_frac_mean = nprobe * (n / n_cells) / n  # == nprobe / n_cells
        section["sweeps"].append(
            {
                "nprobe": nprobe,
                "recall": round(recall, 4),
                "scan_frac_mean": round(scan_frac_mean, 4),
                "scan_frac_worst_cells": round(scan_frac_worst, 4),
                "secs": round(secs, 2),
            }
        )
        print(
            f"nprobe={nprobe}/{n_cells} recall@{k}={recall:.4f} "
            f"scan~{scan_frac_mean:.3f} [{secs:.1f}s]"
        )

    # --- two-level IVF: same corpus/truth, (nprobe_coarse, nprobe_fine)
    # grid; n_coarse x n_fine sized so total buckets ~= the flat cell
    # count (cost-comparable), per-task candidates ~n/(coarse*fine)
    from gnames_spark.operators.ivf import ivf2_topk, train_ivf2

    n_coarse = max(4, int(round(math.sqrt(n_cells) * 2)))
    n_fine = max(2, n_cells // n_coarse)
    t0 = time.monotonic()
    coarse2, fine2 = train_ivf2(
        corpus, DIM, n_coarse, n_fine, n_vectors_hint=n, seed=7
    )
    train2_secs = time.monotonic() - t0
    ivf2 = {
        "n_coarse": n_coarse,
        "n_fine": n_fine,
        "train_secs": round(train2_secs, 2),
        "sweeps": [],
    }
    for pc, pf in ((1, 2), (2, 2), (2, 4), (4, 4)):
        t0 = time.monotonic()
        got_df = ivf2_topk(
            corpus, queries, k=k, coarse=coarse2, fine=fine2,
            nprobe_coarse=pc, nprobe_fine=pf,
        )
        got = {(r["query_id"], r["neighbor_id"]) for r in got_df.collect()}
        secs = time.monotonic() - t0
        recall = len(got & truth) / len(truth) if truth else 1.0
        scan = (pc * pf) / (n_coarse * n_fine)
        ivf2["sweeps"].append(
            {
                "nprobe_coarse": pc,
                "nprobe_fine": pf,
                "recall": round(recall, 4),
                "scan_frac_mean": round(scan, 4),
                "secs": round(secs, 2),
            }
        )
        print(
            f"ivf2 probes={pc}x{pf}/{n_coarse}x{n_fine} recall@{k}={recall:.4f} "
            f"scan~{scan:.3f} [{secs:.1f}s]"
        )
    section["ivf2"] = ivf2

    path = "ANN_RECALL.json"
    report = json.load(open(path)) if os.path.exists(path) else {}
    report["ivf_topk"] = section
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"updated {path} (ivf_topk section incl. ivf2)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
