"""Gopher quality-rule battery (functions/gopherrules.py)."""

from __future__ import annotations

import pytest

from gnames_spark.functions.gopherrules import gopher_quality


def _prose(n):
    # ordinary prose with stopwords; mean word length in range
    base = "the quick brown foxes have moved with great speed to that den and"
    words = (base + " ").split() * (n // 13 + 1)
    return " ".join(words[:n])


@pytest.fixture(scope="module")
def flags(spark):
    rows = [
        (1, _prose(80)),                       # passes everything
        (2, _prose(10)),                       # too short
        (3, "## " + " ".join(["###"] * 60)),   # symbol-stuffed, no stopwords
        (4, "\n".join(["• item one of the list have that"] * 20)
            + "\n" + "\n".join([_prose(12)] * 5)),  # 20/25 bullets = 0.8
        (5, "\n".join(["• " + _prose(3)] * 50)),  # > 90% bullet lines
        (6, "\n".join([_prose(8) + " ..."] * 10)),  # 100% ellipsis lines
        (7, " ".join(["12345"] * 60)),         # numeric words, no alpha
        (8, ""),                               # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.doc_id: r for r in gopher_quality(df).collect()}


class TestGopherRules:
    def test_clean_prose_passes(self, flags):
        r = flags[1]
        assert r.passes and r.fail_reasons == ""
        assert r.n_words == 80 and r.n_stopwords >= 2

    def test_short_doc_fails_word_count_only(self, flags):
        r = flags[2]
        assert not r.passes
        assert r.fail_reasons == "word_count"

    def test_symbol_stuffing(self, flags):
        r = flags[3]
        assert not r.passes
        assert "symbol_ratio" in r.fail_reasons
        assert "stopwords" in r.fail_reasons
        assert r.symbol_ratio == 1.0

    def test_bullet_fraction_boundary(self, flags):
        # doc 4: 20 of 25 lines are bullets (0.8 <= 0.9) -> rule passes
        assert flags[4].bullet_line_frac == 0.8
        assert "bullet_lines" not in flags[4].fail_reasons
        # doc 5: every line is a bullet -> fails
        assert flags[5].bullet_line_frac == 1.0 and not flags[5].passes
        assert "bullet_lines" in flags[5].fail_reasons

    def test_ellipsis_lines(self, flags):
        r = flags[6]
        assert r.ellipsis_line_frac == 1.0
        assert "ellipsis_lines" in r.fail_reasons

    def test_alpha_words(self, flags):
        r = flags[7]
        assert r.alpha_word_frac == 0.0
        assert "alpha_words" in r.fail_reasons

    def test_empty_doc(self, flags):
        r = flags[8]
        assert not r.passes and "word_count" in r.fail_reasons
        assert r.mean_word_len == 0.0

    def test_no_python_no_shuffle(self, spark):
        df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan
