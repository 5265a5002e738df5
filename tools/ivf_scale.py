"""Scale-growth evidence for the IVF similarity-search path.

Runs ``ivf_topk`` on deterministically generated CLUSTERED corpora of
increasing size with sqrt-rule cells (``derive_ivf_cells``) and a FIXED
nprobe, against a brute-force ``cosine_topk`` truth on a fixed-size
query sample. The artifact is the growth curve: per-query scored
candidates grow ~sqrt(n) (nprobe cells of ~n/sqrt(n) members each)
while recall stays flat — the sub-linear serving shape that justifies
IVF beside the sign-LSH pair miner (ANN_SCALE.json 'runs' shows the
LSH curve; this adds the 'ivf' section).

Corpus: the same clustered generator as tools/ivf_recall.py (gaussian
centers + isotropic noise), cluster count scaled with n so cluster
size stays constant — the shape a growing real embedding corpus has
(more topics, not fatter topics).

Updates the ``ivf`` key of ANN_SCALE.json in place. Usage:
    python tools/ivf_scale.py [sizes_csv] [nprobe] [k]
"""

from __future__ import annotations

import json
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
DOCS_PER_CLUSTER = 100
N_QUERIES = 300


def make_corpus(spark, n: int, seed: int = 13):
    """Executor-side deterministic clustered corpus (mapInPandas over
    spark.range — the driver never materializes the vectors)."""
    import pandas as pd

    n_clusters = max(8, n // DOCS_PER_CLUSTER)
    n_noise = int(n * NOISE_FRAC)
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, DIM)) * 3.0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM))
            for j, i in enumerate(ids):
                r = np.random.RandomState(seed ^ (int(i) * 2654435761 % 2**31))
                if i >= n - n_noise:
                    out[j] = r.standard_normal(DIM)
                else:
                    out[j] = centers[int(i) % n_clusters] + r.standard_normal(DIM) * 0.8
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [list(map(float, v)) for v in out]}
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def main() -> int:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "10000,30000,100000").split(",")]
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="ivf_scale", shuffle_partitions=32)

    section = {
        "dim": DIM,
        "nprobe": nprobe,
        "k": k,
        "n_queries": N_QUERIES,
        "corpus": f"clustered: n/{DOCS_PER_CLUSTER} centers + {NOISE_FRAC:.0%} noise",
        "sizing": "derive_ivf_cells(n) ~= sqrt(n); per-query scored candidates ~= nprobe*sqrt(n)",
        "runs": [],
    }
    for n in sizes:
        corpus = make_corpus(spark, n).persist()
        corpus.count()
        stride = max(1, n // N_QUERIES)
        queries = corpus.filter(F.col("vec_id") % stride == 0).persist()
        n_q = queries.count()

        t0 = time.monotonic()
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(queries, corpus, k=k).collect()
        }
        exact_secs = time.monotonic() - t0

        n_cells = derive_ivf_cells(n)
        t0 = time.monotonic()
        cents = train_ivf_centroids(corpus, DIM, n_cells, seed=7)
        train_secs = time.monotonic() - t0
        postings, _ = build_ivf_index(corpus, cents)
        sizes_by_cell = [
            r["n"] for r in postings.groupBy("cell").agg(F.count("*").alias("n")).collect()
        ]
        t0 = time.monotonic()
        got_df, _ = ivf_topk(corpus, queries, k=k, centroids=cents, nprobe=nprobe)
        got = {(r["query_id"], r["neighbor_id"]) for r in got_df.collect()}
        query_secs = time.monotonic() - t0
        recall = len(got & truth) / len(truth) if truth else 1.0
        run = {
            "n": n,
            "n_cells": n_cells,
            "mean_cell": round(n / n_cells, 1),
            "max_cell": max(sizes_by_cell),
            "train_secs": round(train_secs, 2),
            "exact_secs": round(exact_secs, 2),
            "ivf_query_secs": round(query_secs, 2),
            "queries_per_sec": round(n_q / query_secs, 1),
            "scan_frac_mean": round(nprobe / n_cells, 4),
            "scored_per_query": round(nprobe * n / n_cells, 1),
            "recall": round(recall, 4),
        }
        section["runs"].append(run)
        print(
            f"n={n} cells={n_cells} recall@{k}={recall:.4f} "
            f"scored/query~{run['scored_per_query']} ivf={query_secs:.1f}s "
            f"exact={exact_secs:.1f}s", flush=True,
        )
        queries.unpersist()
        corpus.unpersist()

    path = "ANN_SCALE.json"
    report = json.load(open(path)) if os.path.exists(path) else {}
    report["ivf"] = section
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"updated {path} (ivf section)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
