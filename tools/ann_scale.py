"""Scale-growth evidence for the banded sign-LSH ANN path.

Runs ``ann_dup_pairs`` (sub-quadratic: posting join, bands derived from
the threshold) and ``blocked_cosine_pairs`` (exact all-pairs GEMM,
O(n²) work spread over block tasks) on deterministically generated
embedding corpora of increasing size, at the near-dup operating point
(τ=0.9 → 14×8-bit bands). The artifact is the growth curve: exact wall
time must grow ~n², the ANN wall ~n — the reason the 10^12-doc
embedding dedup runs the banded path and keeps the exact path for
small-n oracles (operators/embeddings.py docstrings).

Corpus: vectors generated executor-side (mapInPandas over spark.range —
the driver never materializes them), one deterministic unit-ish
gaussian per id, plus planted near-dup twins at cosine ≈ 0.9-0.99 for
the last ``plant_frac`` of ids (same planting math as tools/ann_recall.py).

Writes ANN_SCALE.json. Usage:
    python tools/ann_scale.py [sizes_csv] [threshold] [dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox-only shuffle scratch

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gnames_spark.operators.embeddings import (  # noqa: E402
    ann_dup_pairs,
    blocked_cosine_pairs,
    derive_sign_banding,
)
from gnames_spark.session import get_spark  # noqa: E402

PLANT_FRAC = 0.05


def gen_embeddings(spark, n: int, dim: int, threshold: float):
    """(vec_id, embedding) — deterministic per-id gaussians; the last
    PLANT_FRAC of ids are near-dup twins of base ids (cosine spread
    over [threshold+0.005, 0.99]). Generated executor-side so the
    driver holds nothing."""
    n_plants = int(n * PLANT_FRAC)
    n_base = n - n_plants

    def gen(batches):
        for pdf in batches:
            rows = []
            for vid in pdf["id"]:
                vid = int(vid)
                if vid < n_base:
                    rng = np.random.RandomState(vid % (2**31))
                    v = rng.standard_normal(dim)
                else:
                    j = vid - n_base
                    base_id = j % n_base
                    rng = np.random.RandomState(base_id % (2**31))
                    v = rng.standard_normal(dim)
                    tgt = threshold + 0.005 + (0.99 - threshold - 0.005) * (
                        j / max(1, n_plants - 1)
                    )
                    s = np.linalg.norm(v) / np.sqrt(dim) * np.sqrt(1.0 / tgt**2 - 1.0)
                    trng = np.random.RandomState((vid + 7919) % (2**31))
                    v = v + s * trng.standard_normal(dim)
                rows.append((vid, [float(x) for x in v]))
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main() -> int:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "10000,30000,100000").split(",")]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark(app_name="ann_scale")

    report = {
        "threshold": threshold,
        "dim": dim,
        "plant_frac": PLANT_FRAC,
        "sizing": "size-aware derive_sign_banding(threshold, n) per run",
        "runs": [],
    }
    for n in sizes:
        emb = gen_embeddings(spark, n, dim, threshold).persist()
        emb.count()  # generation off the clock

        band_bits, bands = derive_sign_banding(threshold, n)
        t0 = time.monotonic()
        pairs, overflow = ann_dup_pairs(
            emb, threshold, dim, bucket_cap=512, n_vectors_hint=n
        )
        n_ann = pairs.count()
        ann_secs = round(time.monotonic() - t0, 2)
        n_over = overflow.count()

        t0 = time.monotonic()
        n_exact = blocked_cosine_pairs(emb, threshold, n_blocks=16).count()
        exact_secs = round(time.monotonic() - t0, 2)

        run = {
            "n": n,
            "band_bits": band_bits,
            "n_bands": bands,
            "ann_secs": ann_secs,
            "ann_pairs": n_ann,
            "ann_overflow_buckets": n_over,
            "exact_secs": exact_secs,
            "exact_pairs": n_exact,
            "recall_vs_exact": round(n_ann / n_exact, 4) if n_exact else 1.0,
            "ann_vecs_per_sec": round(n / ann_secs, 1),
        }
        report["runs"].append(run)
        print(json.dumps(run))
        emb.unpersist()

    rs = report["runs"]
    if len(rs) >= 2:
        a, b = rs[0], rs[-1]
        ratio = b["n"] / a["n"]
        report["growth"] = {
            "size_ratio": ratio,
            "ann_time_ratio": round(b["ann_secs"] / a["ann_secs"], 2),
            "exact_time_ratio": round(b["exact_secs"] / a["exact_secs"], 2),
            "note": (
                "linear growth predicts time_ratio ≈ size_ratio "
                f"({ratio:.0f}); quadratic predicts ≈ {ratio**2:.0f}"
            ),
        }
    with open("ANN_SCALE.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote ANN_SCALE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
