"""Batched invariant tests for the crawl-hygiene Catalyst contracts.

The pure-numpy kernels get hypothesis (tests/test_properties.py); these
contracts live in Catalyst expressions, so per-example driving would
spend all its time in job scheduling. Instead: seeded adversarial
generators build a few hundred rows, ONE Spark job checks the
invariant over all of them (violations surface with the offending row).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gnames_spark.functions.pii import redact_pii
from gnames_spark.functions.urlnorm import canonical_url
from gnames_spark.functions.chunking import chunk_docs
from gnames_spark.operators.sampling import hash_sample


def _messy_urls(n=300, seed=7):
    rnd = random.Random(seed)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://"]
    hosts = ["Example.com", "www.example.com", "a.b.example.org", "x.io",
             "WWW.UPPER.NET"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/A/B", "/p//q///"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=0",
               "?fbclid=1&z=9&y=8", "?ref=t&ref2=keep"]
    frags = ["", "#x", "#a?b=1"]
    out = []
    for _ in range(n):
        out.append(
            rnd.choice(schemes) + rnd.choice(hosts) + rnd.choice(ports)
            + rnd.choice(paths) + rnd.choice(queries) + rnd.choice(frags)
        )
    return out


class TestCanonicalUrlInvariants:
    def test_idempotent(self, spark):
        """canonical is a projection: applying it twice = once, for
        every generated messy URL."""
        df = spark.createDataFrame([(u,) for u in _messy_urls()], ["url"])
        once = df.select("url", canonical_url("url").alias("c1"))
        twice = once.select(
            "url", "c1", canonical_url("c1").alias("c2")
        )
        bad = twice.filter(F.col("c1") != F.col("c2")).collect()
        assert bad == [], bad[:5]

    def test_never_null_and_scheme_preserved(self, spark):
        df = spark.createDataFrame([(u,) for u in _messy_urls(seed=8)], ["url"])
        out = df.select("url", canonical_url("url").alias("c"))
        bad = out.filter(
            F.col("c").isNull()
            | ~F.lower("c").startswith(F.lower(F.regexp_extract("url", r"^([a-zA-Z]+://)", 1)))
        ).collect()
        assert bad == [], bad[:5]


class TestPIIInvariants:
    def _texts(self, n=200, seed=11):
        rnd = random.Random(seed)
        words = ["lorem", "ipsum", "contact", "page", "the", "2025", "v1.2"]
        pii = ["bob@example.com", "a.b+c@x.co", "10.0.0.1", "192.168.255.254",
               "+1 (555) 123-4567", "030-1234567", "555 123 4567"]
        out = []
        for _ in range(n):
            toks = [rnd.choice(words) for _ in range(rnd.randint(0, 12))]
            for _ in range(rnd.randint(0, 3)):
                toks.insert(rnd.randint(0, len(toks)), rnd.choice(pii))
            out.append(" ".join(toks))
        return out

    def test_idempotent_and_exhaustive(self, spark):
        """One pass removes every plantable match (a second pass finds
        nothing), for adversarially mixed texts."""
        df = spark.createDataFrame([(t,) for t in self._texts()], ["text"])
        once = df.select("text", redact_pii("text").alias("r1"))
        twice = once.select("text", "r1", redact_pii("r1").alias("r2"))
        bad = twice.filter(F.col("r1") != F.col("r2")).collect()
        assert bad == [], bad[:5]
        # no planted pii string survives anywhere
        leak = once.filter(
            F.col("r1").contains("@example.com")
            | F.col("r1").rlike(r"\d+\.\d+\.\d+\.\d+")
            | F.col("r1").contains("555) 123")
        ).collect()
        assert leak == [], leak[:5]


class TestChunkingInvariants:
    @pytest.mark.parametrize("n,chunk,stride", [
        (0, 8, 8), (1, 8, 8), (7, 8, 8), (8, 8, 8), (9, 8, 8),
        (17, 8, 3), (24, 8, 8), (25, 8, 4), (100, 16, 7), (31, 5, 5),
    ])
    def test_coverage_and_reconstruction(self, spark, n, chunk, stride):
        """Every token lands in >= 1 window; with stride == chunk the
        windows concatenate back to the exact token sequence."""
        text = " ".join(f"t{i}" for i in range(n))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = chunk_docs(df, chunk, stride).orderBy("chunk_id").collect()
        toks = [t for r in rows for t in r.chunk_text.split()]
        if stride == chunk:
            assert toks == [f"t{i}" for i in range(n)]
        else:
            assert set(toks) == {f"t{i}" for i in range(n)}
        assert all(1 <= r.n_tokens <= chunk for r in rows)
        assert all(r.n_tokens == len(r.chunk_text.split()) for r in rows)


class TestSamplingInvariants:
    def test_rate_nesting(self, spark):
        """Samples at increasing rates under one salt are NESTED —
        the property that makes rate changes reproducible subsets
        (u < r1 implies u < r2 for r1 < r2)."""
        df = spark.range(5000).select(F.col("id").alias("doc_id"))
        s1 = {r.doc_id for r in hash_sample(df, 0.1, salt="s").collect()}
        s2 = {r.doc_id for r in hash_sample(df, 0.3, salt="s").collect()}
        s3 = {r.doc_id for r in hash_sample(df, 0.7, salt="s").collect()}
        assert s1 <= s2 <= s3
        assert len(s1) < len(s2) < len(s3)
