"""Measure banded sign-LSH ANN recall vs the exact blocked all-pairs path.

The sf embeddings table is near-random (no pairs above cosine 0.5), so a
recall measurement on it alone is vacuous. This tool therefore PLANTS
deterministic near-duplicates: for each of the first ``n_plants`` base
vectors, a twin v' = v + sigma·g (seeded gaussian g) is added, giving
cosine(v, v') ≈ 1/sqrt(1 + sigma²·d/|v|²) — sigma is chosen so plants
land in the 0.9-0.99 band, the regime embedding near-dup dedup targets.

Ground truth = ``blocked_cosine_pairs`` (exact) over base+plants at the
threshold; measured = ``ann_dup_pairs`` (banded sign-LSH) at several
band counts, including the ``optimal_sign_bands``-derived operating
point whose design catch probability at the threshold is ≥ 0.99 — the
sign-LSH analog of the MinHash banding derivation in config.py.

Writes ANN_RECALL.json. Usage:
    python tools/ann_recall.py [sf_dir] [threshold] [n_plants]
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

from gnames_spark.operators.embeddings import (  # noqa: E402
    ann_dup_pairs,
    ann_topk,
    blocked_cosine_pairs,
    derive_sign_banding,
    optimal_sign_bands,
    signlsh_catch_probability,
)
from gnames_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    n_plants = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    spark = get_spark(app_name="ann_recall", shuffle_partitions=16)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = [(int(r["vec_id"]), list(r["embedding"])) for r in emb.collect()]
    n_base = len(base)
    dim = len(base[0][1])

    # plant near-dup twins: v' = v + sigma*g, sigma per-plant so cosines
    # spread across [threshold, ~0.99] — deterministic (seeded)
    rng = np.random.RandomState(7)
    plants = []
    max_id = max(i for i, _ in base)
    tgt = np.linspace(threshold + 0.005, 0.99, n_plants)
    for j in range(n_plants):
        vid, v = base[j % n_base]
        v = np.asarray(v, dtype=np.float64)
        c = tgt[j]
        # cosine(v, v + s·g) ≈ 1/sqrt(1 + s²·d/|v|²)  for g ~ N(0, I)
        s = np.linalg.norm(v) / np.sqrt(dim) * np.sqrt(1.0 / c**2 - 1.0)
        twin = v + s * rng.standard_normal(dim)
        plants.append((max_id + 1 + j, [float(x) for x in twin]))
    allv = spark.createDataFrame(base + plants, "vec_id long, embedding array<double>").persist()
    allv.count()

    t0 = time.monotonic()
    exact = {
        (r["id_a"], r["id_b"])
        for r in blocked_cosine_pairs(allv, threshold, n_blocks=8).collect()
    }
    exact_secs = time.monotonic() - t0

    band_bits = 8
    derived = optimal_sign_bands(threshold, band_bits)
    report = {
        "sf_dir": sf_dir,
        "threshold": threshold,
        "n_base": n_base,
        "n_plants": n_plants,
        "dim": dim,
        "exact_pairs": len(exact),
        "exact_secs": round(exact_secs, 2),
        "band_bits": band_bits,
        "derived_bands": derived,
        "design_catch_at_threshold": round(
            signlsh_catch_probability(threshold, derived, band_bits), 4
        ),
        "sweeps": [],
    }
    n_total = n_base + n_plants
    sa_bits, sa_bands = derive_sign_banding(threshold, n_total)
    points = [(nb, band_bits, "band sweep") for nb in sorted({1, 4, max(1, derived // 2), derived})]
    points.append((sa_bands, sa_bits, f"size-aware operating point (n={n_total})"))
    for nb, bits, label in points:
        t0 = time.monotonic()
        pairs, _ = ann_dup_pairs(allv, threshold, dim, n_bands=nb, band_bits=bits)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        secs = time.monotonic() - t0
        recall = (len(got & exact) / len(exact)) if exact else 1.0
        report["sweeps"].append(
            {
                "n_bands": nb,
                "band_bits": bits,
                "label": label,
                "design_catch": round(signlsh_catch_probability(threshold, nb, bits), 4),
                "recall": round(recall, 4),
                "found_pairs": len(got),
                "secs": round(secs, 2),
            }
        )
        print(f"bands={nb}x{bits} ({label}) design={report['sweeps'][-1]['design_catch']} "
              f"recall={recall:.4f} pairs={len(got)}/{len(exact)} [{secs:.1f}s]")

    # --- ann_topk: thresholded top-k recall at the size-aware point ---
    # exact thresholded top-k derives from the exact pair set (mirror +
    # rank per query) — no second O(n²) pass
    k = 3
    exact_scored = {}
    for r in blocked_cosine_pairs(allv, threshold, n_blocks=8).collect():
        exact_scored.setdefault(r["id_a"], []).append((r["id_b"], r["cosine"]))
        exact_scored.setdefault(r["id_b"], []).append((r["id_a"], r["cosine"]))
    truth_topk = set()
    for q, neigh in exact_scored.items():
        neigh.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, cos) in enumerate(neigh[:k], start=1):
            truth_topk.add((q, nid, rank))
    t0 = time.monotonic()
    approx, _ = ann_topk(
        allv, dim=dim, k=k, min_cosine=threshold,
        n_bands=sa_bands, band_bits=sa_bits, filter_below_min=True,
    )
    got_topk = {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in approx.collect()
    }
    topk_secs = time.monotonic() - t0
    topk_recall = (len(got_topk & truth_topk) / len(truth_topk)) if truth_topk else 1.0
    report["ann_topk"] = {
        "k": k,
        "min_cosine": threshold,
        "n_bands": sa_bands,
        "band_bits": sa_bits,
        "truth_rows": len(truth_topk),
        "found_rows": len(got_topk),
        "recall": round(topk_recall, 4),
        "secs": round(topk_secs, 2),
    }
    print(
        f"ann_topk k={k} bands={sa_bands}x{sa_bits} recall={topk_recall:.4f} "
        f"rows={len(got_topk)}/{len(truth_topk)} [{topk_secs:.1f}s]"
    )

    with open("ANN_RECALL.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote ANN_RECALL.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
