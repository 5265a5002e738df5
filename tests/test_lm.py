"""Corpus-trained unigram scoring (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gnames_spark.operators.lm import score_docs, train_unigram


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zxqv qqzz vvxx zzzz glorp"),  # gibberish: every token rare
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestUnigramLM:
    def test_model_probabilities(self, corpus):
        model = {r.token: r.logp for r in train_unigram(corpus).collect()}
        # 17 tokens total; 'the' appears 4x
        assert model["the"] == round(math.log(4 / 17), 8)
        assert model["cat"] == round(math.log(1 / 17), 8)
        assert len(model) == 12  # distinct tokens

    def test_vocab_cap_is_deterministic(self, corpus):
        top = train_unigram(corpus, max_vocab=3).collect()
        # 'the'(4), 'on'(2), 'sat'(2) — 'on' beats 'sat' by token tiebreak
        assert {r.token for r in top} == {"the", "on", "sat"}

    def test_gibberish_scores_higher(self, corpus):
        model = train_unigram(corpus)
        got = {r.doc_id: r for r in score_docs(corpus, model).collect()}
        assert got[3].avg_neg_logprob > got[1].avg_neg_logprob
        assert got[1].n_tokens == 6 and got[3].n_tokens == 5
        assert got[4].n_tokens == 0 and got[4].avg_neg_logprob is None

    def test_oov_floor(self, corpus, spark):
        model = train_unigram(corpus, max_vocab=3)
        unseen = spark.createDataFrame(
            [(9, "totally unseen words here")], ["doc_id", "text"]
        )
        got = score_docs(unseen, model, oov_logp=-20.0).first()
        assert got.avg_neg_logprob == 20.0  # every token OOV

    def test_exact_mean_matches_python(self, corpus):
        """The decimal-sum pipeline reproduces a sequential Python
        computation digit-for-digit (the determinism contract)."""
        model = {r.token: r.logp for r in train_unigram(corpus).collect()}
        got = {r.doc_id: r.avg_neg_logprob
               for r in score_docs(corpus, train_unigram(corpus)).collect()}
        for doc_id, text in [(1, "the cat sat on the mat"),
                             (3, "zxqv qqzz vvxx zzzz glorp")]:
            toks = text.lower().split()
            want = round(-sum(model[t] for t in toks) / len(toks), 6)
            assert got[doc_id] == want

    def test_no_python_in_plans(self, corpus):
        model = train_unigram(corpus)
        plan = (
            score_docs(corpus, model)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Window" not in plan


class TestTfidfKeywords:
    def test_keywords_rank_distinctive_terms(self, spark):
        from gnames_spark.operators.lm import tfidf_keywords

        rows = [
            (1, "common common common zebra zebra unique"),
            (2, "common words everywhere common words"),
            (3, "common words again and again"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = tfidf_keywords(docs, k=2).collect()
        got = {(r.doc_id, r.rank): (r.term, r.score) for r in out}
        import math
        idf = lambda df: round(math.log(3 / df), 8)
        # doc 1: zebra tf=2 df=1 beats common tf=3 df=3 (idf 0)
        assert got[(1, 1)][0] == "zebra"
        assert got[(1, 1)][1] == round(2 * idf(1), 6)
        assert got[(1, 2)][0] == "unique"
        # 'common' appears in all docs -> idf 0 -> never a keyword above
        # any df<3 term with tf >= 1
        assert all(t != "common" or s == 0.0 for t, s in got.values())
        # exactly k rows per doc with ranks 1..k
        ranks = {}
        for (d, r), _ in got.items():
            ranks.setdefault(d, []).append(r)
        assert all(sorted(v) == [1, 2] for v in ranks.values())

    def test_tie_break_by_term(self, spark):
        from gnames_spark.operators.lm import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "bb aa"), (2, "cc dd")], ["doc_id", "text"]
        )
        out = {(r.doc_id, r.rank): r.term for r in tfidf_keywords(docs, 2).collect()}
        assert out[(1, 1)] == "aa" and out[(1, 2)] == "bb"


class TestScriptProfile:
    def test_counts_and_dominant(self, spark):
        from gnames_spark.functions.textstats import dominant_script, script_counts

        rows = [
            (1, "hello world"),
            (2, "привет мир hello"),
            (3, "你好世界"),
            (4, "مرحبا بالعالم"),
            (5, "123 --- !!!"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r.doc_id: r
            for r in df.select(
                "doc_id", *script_counts("text"),
                dominant_script("text").alias("dom"),
            ).collect()
        }
        assert out[1].n_latin == 10 and out[1].dom == "latin"
        assert out[2].n_cyrillic == 9 and out[2].n_latin == 5
        assert out[2].dom == "cyrillic"
        assert out[3].n_han == 4 and out[3].dom == "han"
        assert out[4].dom == "arabic"
        assert out[5].dom == "none"

    def test_tie_breaks_lexically_greatest(self, spark):
        from gnames_spark.functions.textstats import dominant_script

        df = spark.createDataFrame([(1, "ab мк")], ["doc_id", "text"])
        # latin 2 vs cyrillic 2 -> 'latin' > 'cyrillic' lexically
        assert df.select(dominant_script("text")).first()[0] == "latin"


class TestZipfHead:
    def test_head_ranks_and_freqs(self, corpus, spark):
        from gnames_spark.operators.lm import zipf_head

        rows = zipf_head(corpus, k=3).orderBy("rank").collect()
        # 17 tokens total; 'the' 4x, then on/sat at 2 (token tiebreak)
        assert [(r.rank, r.token, r.n_occurrences) for r in rows] == [
            (1, "the", 4),
            (2, "on", 2),
            (3, "sat", 2),
        ]
        assert rows[0].freq == round(4 / 17, 8)

    def test_k_larger_than_vocab(self, corpus):
        from gnames_spark.operators.lm import zipf_head

        rows = zipf_head(corpus, k=1000).collect()
        assert len(rows) == 12  # full vocab, no padding
        assert {r.rank for r in rows} == set(range(1, 13))

    def test_partition_invariant(self, corpus):
        from gnames_spark.operators.lm import zipf_head

        a = [tuple(r) for r in zipf_head(corpus, k=5).orderBy("rank").collect()]
        b = [
            tuple(r)
            for r in zipf_head(corpus.repartition(7), k=5).orderBy("rank").collect()
        ]
        assert a == b


class TestBigramLM:
    def test_conditional_probabilities(self, corpus, spark):
        import math

        from gnames_spark.operators.lm import train_bigram

        model = {
            (r.prev, r.token): r.logp for r in train_bigram(corpus).collect()
        }
        # 'the' is followed by: cat, mat, dog, rug (once each) -> p = 1/4
        assert model[("the", "cat")] == round(math.log(1 / 4), 8)
        # 'sat on' twice out of 'sat ...' twice -> p = 1
        assert model[("sat", "on")] == 0.0
        # 'on the' twice out of two 'on' contexts -> p = 1
        assert model[("on", "the")] == 0.0

    def test_min_count_filters_pairs_not_contexts(self, corpus):
        import math

        from gnames_spark.operators.lm import train_bigram

        model = {
            (r.prev, r.token): r.logp
            for r in train_bigram(corpus, min_count=2).collect()
        }
        assert ("the", "cat") not in model  # pair count 1 dropped
        # kept pair still normalized by the FULL context count:
        # 'on the' c=2, c(on)=2
        assert model[("on", "the")] == round(math.log(2 / 2), 8)

    def test_scores_and_short_docs(self, corpus, spark):
        from gnames_spark.operators.lm import score_docs_bigram, train_bigram

        extra = spark.createDataFrame([(5, "one")], ["doc_id", "text"])
        docs = corpus.unionByName(extra)
        model = train_bigram(docs)
        got = {r.doc_id: r for r in score_docs_bigram(docs, model).collect()}
        assert got[1].n_bigrams == 5  # 6 tokens
        assert got[4].n_bigrams == 0 and got[4].avg_neg_logprob is None
        assert got[5].n_bigrams == 0  # single token: no bigram
        # gibberish doc: all pairs unique -> every conditional p = 1 ->
        # surprisal 0; doc 1's shared contexts make it MORE surprising
        assert got[3].avg_neg_logprob == 0.0
        assert got[1].avg_neg_logprob > 0.0

    def test_oov_floor(self, corpus, spark):
        from gnames_spark.operators.lm import score_docs_bigram, train_bigram

        model = train_bigram(corpus)
        unseen = spark.createDataFrame(
            [(9, "purple elephant")], ["doc_id", "text"]
        )
        got = score_docs_bigram(unseen, model).first()
        assert got.n_bigrams == 1 and got.avg_neg_logprob == 20.0

    def test_partition_invariant(self, corpus):
        from gnames_spark.operators.lm import score_docs_bigram, train_bigram

        a = sorted(
            map(tuple, score_docs_bigram(corpus, train_bigram(corpus)).collect())
        )
        b = sorted(
            map(
                tuple,
                score_docs_bigram(
                    corpus.repartition(9), train_bigram(corpus.repartition(5))
                ).collect(),
            )
        )
        assert a == b
