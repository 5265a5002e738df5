"""Regression ("bug") corpus — named dedup edge cases, one per class.

The reference pins past production bugs as named test cases
(`/root/reference/internal/io/rest/bug_test.go:17-87,143-177,180-201,
229-344`: fuzzy misspellings, partial-match suppression, tie semantics,
match-type fixes). SURVEY §5 maps that layer to this file: each test is
the dedup analog of a reference bug class, with a tiny literal corpus
shaped to trip the historical failure mode.
"""

import pytest
from pyspark.sql import functions as F

from gnames_spark.config import DedupConfig
from gnames_spark.pipeline import DedupPipeline

CFG = DedupConfig(shuffle_partitions=8, bucket_cap=100_000, anchor_cap=100_000)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sailors navigate the harbor channel under a gray autumn sky "
    "counting gulls and cargo cranes along the waterfront promenade "
    "as fishermen mend their nets beside weathered wooden piers"
)


def _pages(spark, rows):
    """rows: list[(url, text)] → pages df shaped like the corpus."""
    return spark.createDataFrame(
        [(u, t, "en") for u, t in rows], "url string, text string, lang string"
    )


def _components(spark, rows, **kw):
    res = DedupPipeline(spark, CFG, **kw).run(_pages(spark, rows))
    comp = {}
    for r in res["components"].collect():
        comp[r["doc_id"]] = r["component_id"]
    ids = {u: i for u, i in spark.createDataFrame(
        [(u,) for u, _ in rows], "url string"
    ).select("url", F.xxhash64("url").alias("i")).collect()}
    return comp, ids


class TestRegressionCorpus:
    def test_bug_one_token_edit_still_clusters(self, spark):
        """Analog: fuzzy misspelling matches ('Drosohila melanogaster',
        bug_test.go:32). A single-token edit in a LONG page changes only
        ~shingle_k of ~n shingles (jaccard ≈ (n−k)/(n+k) ≫ τ for n ≫ k)
        and MUST cluster with the original — near-dup detection cannot
        degrade into exact-only. (A short page is different: one edit in
        40 tokens legitimately falls below τ=0.8 — that is the template
        test below, not a bug.)"""
        long_text = BASE + " " + " ".join(f"w{i:03d}" for i in range(400))
        rows = [
            ("https://a.example/orig", long_text),
            ("https://a.example/edit", long_text.replace("w200", "edited", 1)),
            ("https://a.example/far", "completely different tiny page"),
        ]
        comp, ids = _components(spark, rows)
        assert comp[ids["https://a.example/orig"]] == comp[ids["https://a.example/edit"]]
        assert comp[ids["https://a.example/far"]] != comp[ids["https://a.example/orig"]]

    def test_bug_short_docs_survive_as_singletons(self, spark):
        """Analog: uninomial lookups ('Bubo', bug_test.go:46). Docs
        shorter than shingle_k tokens produce ZERO shingles; they must
        neither crash the kernel nor vanish — every doc gets a component
        assignment, and unsigned shorts stay singletons."""
        rows = [
            ("https://s.example/one", "hi"),
            ("https://s.example/two", "ok then"),
            ("https://s.example/long", BASE),
        ]
        comp, ids = _components(spark, rows)
        assert len(comp) == 3  # nobody dropped
        assert comp[ids["https://s.example/one"]] != comp[ids["https://s.example/two"]]

    def test_bug_shared_template_does_not_false_merge(self, spark):
        """Analog: partial-match suppression (bug_test.go:143-177 pins
        matches that must NOT be reported). Two pages sharing a large
        navigation/footer template but with distinct core content sit
        below the Jaccard threshold and must NOT merge — boilerplate
        alone is not duplication."""
        template = BASE + " site navigation home products contact about"
        rows = [
            ("https://t.example/p1", template + " unique article alpha beta gamma delta epsilon zeta"),
            ("https://t.example/p2", template + " different report one two three four five six"),
        ]
        comp, ids = _components(spark, rows)
        assert comp[ids["https://t.example/p1"]] != comp[ids["https://t.example/p2"]]

    def test_bug_empty_page_megagroup_single_cluster(self, spark):
        """Analog: hot-key overload handling (match_records_map.go:17-22
        truncates hot keys rather than exploding). 200 byte-identical
        parked pages must collapse through the exact screen into ONE
        cluster with ONE representative — and never hit the quadratic
        pair path (star edges only: n-1, not n(n-1)/2)."""
        rows = [(f"https://park.example/{i}", "domain parked") for i in range(200)]
        rows.append(("https://real.example/x", BASE))
        res = DedupPipeline(spark, CFG).run(_pages(spark, rows))
        summary = {
            r["component_id"]: r["n_docs"]
            for r in res["cluster_summary"].collect()
        }
        assert sorted(summary.values()) == [1, 200]
        exact_edges = res["verified_pairs"].filter("method = 'exact'").count()
        assert exact_edges == 199  # star, not all-pairs
        assert res["representatives"].filter("is_representative").count() == 2

    def test_bug_tie_semantics_keep_both(self, spark):
        """Analog: BestResults tie semantics (rest_test.go:739-802 pins
        that equal-scored results are both kept). Two equally-similar
        near-dups of one doc must BOTH survive best-match selection."""
        from gnames_spark.operators.scoring import best_match_per_doc, pair_score

        pairs = spark.createDataFrame(
            [(1, 2, "lsh", 0.91, None), (1, 3, "lsh", 0.91, None),
             (1, 4, "lsh", 0.85, None)],
            "doc_a long, doc_b long, method string, jaccard double, hamming int",
        )
        best = best_match_per_doc(pairs.withColumn("score", pair_score()))
        assert sorted(r["doc_b"] for r in best.collect()) == [2, 3]

    def test_bug_unicode_nfc_nfd_not_conflated(self, spark):
        """Analog: collation-compare fixes (score_internal_test.go:387).
        The tokenization contract does NO unicode normalization (pinned
        in tests/test_unicode.py): NFC 'café' and NFD 'café' are
        DIFFERENT byte sequences and must hash apart deterministically —
        conflating them silently would break byte-identity per url."""
        nfc = "café " + BASE
        nfd = "café " + BASE
        rows = [("https://u.example/nfc", nfc), ("https://u.example/nfd", nfd)]
        comp, ids = _components(spark, rows)
        # one token of ~40 differs → still near-dup by Jaccard; the
        # regression is about the EXACT screen: they must not be
        # byte-identical
        res = DedupPipeline(spark, CFG).run(_pages(spark, rows))
        shas = res["docs"].select("content_sha").distinct().count()
        assert shas == 2

    def test_bug_contained_doc_found_by_substring_path(self, spark):
        """Analog: partial/containment matches (bug_test.go:74 'Oecetis
        complex'). A doc wholly contained in a larger doc falls BELOW
        the Jaccard threshold (size ratio) yet must be caught by the
        winnowing-anchor substring path when enabled."""
        # the shared run must clear min_substring_len (512 chars) and
        # carry >= min_shared_anchors winnowing anchors
        small = BASE + " " + " ".join(f"core{i:03d}" for i in range(80))
        big = (
            small
            + " surrounding editorial commentary expands this article with "
            + "substantial additional prose paragraphs discussing context "
            + "history methodology implications and several named sources "
            + "quoted at length before concluding with an extended summary "
            + "that more than doubles the original length of the piece "
            + "adding enough distinct vocabulary to push jaccard well below "
            + "any near duplicate threshold used by the verification stage "
            + " ".join(f"extra{i:03d}" for i in range(120))
        )
        rows = [("https://c.example/small", small), ("https://c.example/big", big)]
        comp_on, ids = _components(spark, rows, enable_substring=True)
        assert comp_on[ids["https://c.example/small"]] == comp_on[ids["https://c.example/big"]]

    @pytest.mark.parametrize("parts", [2, 8])
    def test_bug_representative_partition_independent(self, spark, parts):
        """Analog: synonym-ordering fixes (bug_test.go:316 pins result
        order). The representative of a cluster must be a pure function
        of the data (min doc_id), independent of partitioning."""
        rows = [(f"https://r.example/{i}", BASE) for i in range(7)]
        pages = _pages(spark, rows).repartition(parts)
        res = DedupPipeline(spark, CFG).run(pages)
        reps = res["representatives"].filter("is_representative").collect()
        assert len(reps) == 1
        min_id = res["docs"].agg(F.min("doc_id")).collect()[0][0]
        assert reps[0]["doc_id"] == min_id
