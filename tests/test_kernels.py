"""Unit tests of the numpy kernels against brute-force oracles.

Models the reference's golden-bit-pattern unit tests
(`/root/reference/pkg/ent/score/score_internal_test.go:16-29`): small,
exact, table-driven.
"""

import numpy as np
import pytest

from gnames_spark.config import DedupConfig, lsh_catch_probability, optimal_bands
from gnames_spark.functions.extraction import extract_text_py
from gnames_spark.functions.minhash import (
    estimate_jaccard,
    minhash_matrix,
    perm_params,
)
from gnames_spark.functions.simhash import hamming64, simhash_array
from gnames_spark.corpus import make_row, render_html


def _hash64(tokens):
    # stand-in shingle hashes for pure-numpy tests: stable 64-bit values
    # derived from token content (same token → same hash across calls)
    import hashlib

    out = [
        int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little", signed=True)
        for t in tokens
    ]
    return np.array(out, dtype=np.int64)


class TestMinHash:
    def test_estimates_jaccard(self):
        """Mean |estimated - true| Jaccard over random set pairs is small."""
        seeds = perm_params(256, seed=42)
        rng = np.random.RandomState(0)
        errs = []
        for _ in range(30):
            n = 200
            overlap = rng.randint(20, 180)
            s1 = set(range(n))
            s2 = set(range(n - overlap, 2 * n - overlap))
            true_j = len(s1 & s2) / len(s1 | s2)
            h1 = _hash64([f"x{i}" for i in sorted(s1)])
            h2 = _hash64([f"x{i}" for i in sorted(s2)])
            mat = minhash_matrix([h1, h2], seeds)
            est = estimate_jaccard(mat[0], mat[1])
            errs.append(abs(est - true_j))
        assert np.mean(errs) < 0.05
        assert np.max(errs) < 0.17

    def test_identical_sets_identical_signatures(self):
        seeds = perm_params(128, seed=42)
        h = _hash64(["a", "b", "c", "d"])
        m1 = minhash_matrix([h], seeds)
        m2 = minhash_matrix([h[::-1].copy()], seeds)  # order-insensitive
        assert (m1 == m2).all()

    def test_empty_doc_sentinel(self):
        seeds = perm_params(16, seed=1)
        mat = minhash_matrix([np.empty(0, np.int64), _hash64(["a"])], seeds)
        from gnames_spark.functions.minhash import EMPTY_SENTINEL

        assert (mat[0] == EMPTY_SENTINEL).all()
        assert (mat[1] != EMPTY_SENTINEL).all()

    def test_batch_equals_single(self):
        """Signatures do not depend on batch composition (partition safety)."""
        seeds = perm_params(64, seed=3)
        docs = [_hash64([f"t{i+j}" for j in range(10)]) for i in range(7)]
        batched = minhash_matrix(docs, seeds)
        singles = np.vstack([minhash_matrix([d], seeds) for d in docs])
        assert (batched == singles).all()


class TestSimHash:
    def test_identical_tokens_zero_hamming(self):
        h = _hash64(["a", "b", "c"])
        s = simhash_array([h, h.copy()])
        assert hamming64(s[0], s[1]) == 0

    def test_disjoint_tokens_large_hamming(self):
        h1 = _hash64([f"a{i}" for i in range(50)])
        h2 = _hash64([f"b{i}" for i in range(50)])
        s = simhash_array([h1, h2])
        assert hamming64(s[0], s[1]) > 16

    def test_small_perturbation_small_hamming(self):
        base = [f"t{i}" for i in range(200)]
        pert = list(base)
        pert[3] = "zz1"
        pert[77] = "zz2"
        s = simhash_array([_hash64(base), _hash64(pert)])
        assert hamming64(s[0], s[1]) <= 8

    def test_batch_equals_single(self):
        docs = [_hash64([f"t{i+j}" for j in range(20)]) for i in range(5)]
        batched = simhash_array(docs)
        singles = np.concatenate([simhash_array([d]) for d in docs])
        assert (batched == singles).all()


class TestLSHParams:
    def test_catch_probability(self):
        # planted-pair banding sanity (FIXTURES.md §5)
        assert lsh_catch_probability(1.0, 32, 4) == pytest.approx(1.0)
        assert lsh_catch_probability(0.8, 32, 4) > 0.999
        assert lsh_catch_probability(0.2, 32, 4) < 0.06

    def test_optimal_bands_meets_recall(self):
        b, r = optimal_bands(128, tau=0.8, target_recall=0.99)
        assert b * r == 128
        assert lsh_catch_probability(0.8, b, r) >= 0.99
        # and is the most selective such choice
        assert lsh_catch_probability(0.8, b * 2, r // 2) >= 0.99 if r > 1 else True

    def test_default_config_valid(self):
        cfg = DedupConfig()
        cfg.validate()
        assert lsh_catch_probability(cfg.jaccard_threshold, cfg.bands, cfg.rows_per_band) >= 0.99
        assert cfg.config_hash() != cfg.with_overrides(shingle_k=7).config_hash()


class TestExtraction:
    GOLDENS = [
        ("<html><body><p>hello world</p></body></html>", "hello world"),
        (
            "<html><head><title>T</title></head><body><nav>menu</nav>"
            "<main><p>a &amp; b</p><p>c</p></main><footer>f</footer>"
            "<script>var x=1;</script></body></html>",
            "a & b c",
        ),
        ("<div>one<!-- hidden -->two</div>", "one two"),
        ("<style>p{}</style><p>  spaced   out\t\n</p>", "spaced out"),
        ("", ""),
    ]

    @pytest.mark.parametrize("html,expected", GOLDENS)
    def test_golden_bytes(self, html, expected):
        assert extract_text_py(html) == expected
        assert extract_text_py(html.encode()) == expected

    def test_corpus_roundtrip(self):
        """Generator + extractor contract: byte-identical recovery."""
        for doc_id in range(0, 50):
            row = make_row(seed=42, doc_id=doc_id)
            assert extract_text_py(row["html"]) == row["text"], doc_id

    def test_unicode_roundtrip(self):
        text = "naïve café — ünïcode ♞ 中文 test"
        html = render_html(text, "t", "d.example.com")
        assert extract_text_py(html) == text


class TestCorpusDeterminism:
    def test_rows_stable(self):
        r1 = make_row(seed=42, doc_id=123)
        r2 = make_row(seed=42, doc_id=123)
        assert r1 == r2

    def test_seed_changes_rows(self):
        assert make_row(seed=42, doc_id=5)["text"] != make_row(seed=43, doc_id=5)["text"]

    def test_exact_group_has_copies(self):
        from gnames_spark.corpus import GROUP_SLOTS, truth_role

        found = 0
        for g in range(200):
            if truth_role(42, g * GROUP_SLOTS) == "exact":
                texts = {make_row(42, g * GROUP_SLOTS + s)["text"] for s in range(GROUP_SLOTS)}
                assert len(texts) == 1
                found += 1
        assert found > 5
