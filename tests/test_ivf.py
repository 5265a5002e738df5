"""IVF similarity search (operators/ivf.py) — the k-means scale path.

Pins: trainer determinism, exactness at nprobe == n_cells, monotone
recall in nprobe, single-cell index membership, cell-cap overflow
accounting, and zero-vector safety.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gnames_spark.operators.embeddings import cosine_topk
from gnames_spark.operators.ivf import (
    build_ivf_index,
    derive_ivf_cells,
    ivf_topk,
    train_ivf_centroids,
)

DIM = 16
N = 240
N_CLUSTERS = 6


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered unit-ish vectors: 6 well-separated centers + noise —
    the corpus shape IVF is built for (real embedding corpora cluster;
    isotropic noise is its worst case and is covered separately)."""
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 4.0
    rows = []
    for i in range(N):
        c = centers[i % N_CLUSTERS]
        v = c + rng.standard_normal(DIM) * 0.5
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


class TestTrainer:
    def test_deterministic_across_calls(self, vectors):
        a = train_ivf_centroids(vectors, DIM, 8, seed=3)
        b = train_ivf_centroids(vectors, DIM, 8, seed=3)
        assert np.array_equal(a, b)
        c = train_ivf_centroids(vectors, DIM, 8, seed=4)
        assert not np.array_equal(a, c)

    def test_unit_norm_centroids(self, vectors):
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)

    def test_zero_vectors_excluded_from_training(self, spark, vectors):
        with_zero = vectors.unionByName(
            spark.createDataFrame([(9999, [0.0] * DIM)], "vec_id long, embedding array<float>")
        )
        a = train_ivf_centroids(vectors, DIM, 8, seed=3)
        b = train_ivf_centroids(with_zero, DIM, 8, seed=3)
        assert np.array_equal(a, b)

    def test_derive_cells_sqrt_rule(self):
        assert derive_ivf_cells(10_000) == 100
        assert derive_ivf_cells(1) == 4  # floor
        assert derive_ivf_cells(10**12) == 65536  # broadcastability cap


class TestIndex:
    def test_every_vector_in_exactly_one_cell(self, vectors):
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        postings, overflow = build_ivf_index(vectors, cents)
        assert overflow.count() == 0
        per_vid = postings.groupBy("vid").count().agg(F.max("count")).first()[0]
        assert per_vid == 1
        assert postings.count() == N

    def test_cell_cap_drops_and_logs(self, vectors):
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        postings, overflow = build_ivf_index(vectors, cents, cell_cap=10)
        over = {r["cell"]: r["n_vecs"] for r in overflow.collect()}
        assert over, "clustered data must overflow a 10-vector cap"
        assert all(n > 10 for n in over.values())
        kept_cells = {r["cell"] for r in postings.select("cell").distinct().collect()}
        assert not (kept_cells & set(over)), "capped cells must leave the index"
        assert postings.count() + sum(over.values()) == N

    def test_zero_vector_assigns_deterministically(self, spark):
        cents = np.eye(4, DIM)
        zv = spark.createDataFrame([(1, [0.0] * DIM)], "vec_id long, embedding array<float>")
        postings, _ = build_ivf_index(zv, cents)
        assert postings.first()["cell"] == 0


class TestTopK:
    def test_exact_at_full_probe(self, vectors):
        """nprobe == n_cells scans everything → EXACTLY brute force
        (ranks, ties, cosines — the whole frame)."""
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        got, _ = ivf_topk(vectors, vectors, k=3, centroids=cents, nprobe=8)
        want = cosine_topk(vectors, vectors, k=3)
        a = set(map(tuple, got.select("query_id", "neighbor_id", "cosine", "rank").collect()))
        b = set(map(tuple, want.select("query_id", "neighbor_id", "cosine", "rank").collect()))
        assert a == b

    def test_recall_monotone_in_nprobe_and_high_on_clustered(self, vectors):
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(vectors, vectors, k=3).collect()
        }
        recalls = []
        for nprobe in (1, 2, 4):
            got, _ = ivf_topk(vectors, vectors, k=3, centroids=cents, nprobe=nprobe)
            hits = {
                (r["query_id"], r["neighbor_id"]) for r in got.collect()
            }
            recalls.append(len(hits & truth) / len(truth))
        assert recalls == sorted(recalls), f"recall must grow with nprobe: {recalls}"
        # clustered corpora are the design case: 2 of 8 probes ≈ full recall
        assert recalls[1] >= 0.95, recalls

    def test_min_cosine_thresholds(self, vectors):
        cents = train_ivf_centroids(vectors, DIM, 8, seed=3)
        got, _ = ivf_topk(
            vectors, vectors, k=5, centroids=cents, nprobe=8, min_cosine=0.9
        )
        assert got.filter(F.col("cosine") < 0.9).count() == 0

    def test_trains_inline_when_no_centroids(self, vectors):
        got, _ = ivf_topk(vectors, vectors, k=1, nprobe=4, n_cells=8, seed=3)
        assert got.count() == N  # every query has >= 1 candidate neighbor


class TestTwoLevelIVF:
    def _train(self, vectors, n_coarse=4, n_fine=3):
        from gnames_spark.operators.ivf import train_ivf2

        return train_ivf2(
            vectors, DIM, n_coarse, n_fine, n_vectors_hint=N,
            sample_per_cell=N, seed=3,
        )

    def test_train_deterministic_and_well_formed(self, vectors):
        coarse1, fine1 = self._train(vectors)
        coarse2, fine2 = self._train(vectors)
        assert np.array_equal(coarse1, coarse2)
        rows1 = sorted(
            (r["cell"], r["fine"], tuple(r["centroid"])) for r in fine1.collect()
        )
        rows2 = sorted(
            (r["cell"], r["fine"], tuple(r["centroid"])) for r in fine2.collect()
        )
        assert rows1 == rows2
        # unit-norm centroids, dense fine ids per cell
        by_cell = {}
        for cell, fid, cent in rows1:
            by_cell.setdefault(cell, []).append(fid)
            assert abs(np.linalg.norm(cent) - 1.0) < 1e-9
        for fids in by_cell.values():
            assert fids == list(range(len(fids)))

    def test_exact_when_probing_everything(self, vectors):
        """All (cell, fine) buckets probed -> every corpus vector is a
        candidate -> exactly brute force (each vector lives in exactly
        one bucket; no dedup needed)."""
        from gnames_spark.operators.ivf import ivf2_topk

        coarse, fine = self._train(vectors)
        got = ivf2_topk(
            vectors, vectors, k=3, coarse=coarse, fine=fine,
            nprobe_coarse=4, nprobe_fine=3,
        )
        want = cosine_topk(vectors, vectors, k=3)
        a = set(map(tuple, got.select("query_id", "neighbor_id", "cosine", "rank").collect()))
        b = set(map(tuple, want.select("query_id", "neighbor_id", "cosine", "rank").collect()))
        assert a == b

    def test_partial_probing_recall_on_clustered(self, vectors):
        from gnames_spark.operators.ivf import ivf2_topk

        coarse, fine = self._train(vectors)
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(vectors, vectors, k=3).collect()
        }
        got = ivf2_topk(
            vectors, vectors, k=3, coarse=coarse, fine=fine,
            nprobe_coarse=2, nprobe_fine=2,
        )
        hits = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        recall = len(hits & truth) / len(truth)
        assert recall >= 0.9, recall
