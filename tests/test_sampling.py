"""Deterministic hash sampling (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gnames_spark.operators.sampling import (
    hash_sample,
    hash_uniform,
    stratified_sample,
    temperature_mix,
    temperature_rates,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(10000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


class TestHashSampling:
    def test_rate_is_respected(self, corpus):
        n = hash_sample(corpus, 0.3, salt="s1").count()
        assert abs(n / 10000 - 0.3) < 0.02  # binomial 3-sigma ~ 0.014

    def test_deterministic_and_partition_invariant(self, corpus):
        a = {r.doc_id for r in hash_sample(corpus, 0.25, salt="s1").collect()}
        b = {
            r.doc_id
            for r in hash_sample(corpus.repartition(17), 0.25, salt="s1").collect()
        }
        assert a == b  # F.rand(seed) would fail this

    def test_salt_decorrelates(self, corpus):
        a = {r.doc_id for r in hash_sample(corpus, 0.5, salt="s1").collect()}
        b = {r.doc_id for r in hash_sample(corpus, 0.5, salt="s2").collect()}
        overlap = len(a & b) / 10000
        assert abs(overlap - 0.25) < 0.03  # independent draws

    def test_nested_rates(self, corpus):
        # sampling at 0.5 then 0.2 of the sample (same salt family but
        # different salts) ~= 0.1 overall
        s = hash_sample(hash_sample(corpus, 0.5, salt="a"), 0.2, salt="b")
        assert abs(s.count() / 10000 - 0.1) < 0.015

    def test_stratified(self, corpus):
        out = stratified_sample(
            corpus, {"0": 1.0, "1": 0.5, "2": 0.0}, "stratum", salt="mix"
        )
        got = {
            r.stratum: r.n
            for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
        }
        assert got["0"] == 2500  # rate 1.0 keeps everything
        assert abs(got["1"] / 2500 - 0.5) < 0.04
        assert "2" not in got  # rate 0.0
        assert "3" not in got  # unknown stratum -> default 0.0

    def test_pure_filter_plan(self, corpus):
        plan = (
            hash_sample(corpus, 0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan

    def test_uniform_bounds(self, corpus):
        row = corpus.select(
            F.min(hash_uniform("doc_id")).alias("lo"),
            F.max(hash_uniform("doc_id")).alias("hi"),
        ).first()
        assert 0.0 <= row.lo and row.hi < 1.0

    def test_salt_validation(self, corpus):
        with pytest.raises(ValueError):
            hash_uniform("doc_id", "bad'salt")

    def test_key_col_resolved_not_spliced(self, spark):
        # column names go through the Column API: a name that would be
        # SQL if spliced resolves as a literal identifier, and a Column
        # object is accepted directly
        from gnames_spark.operators.sampling import hash_prefix

        df = spark.createDataFrame([(7, "x")], ["id", "weird' col--"])
        a = df.select(hash_prefix("weird' col--", "s").alias("h")).first().h
        b = df.select(
            hash_prefix(F.col("weird' col--"), "s").alias("h")
        ).first().h
        c = df.select(hash_prefix(F.lit("x"), "s").alias("h")).first().h
        assert a == b == c


@pytest.fixture(scope="module")
def skewed(spark):
    # strata sizes 6000 / 3000 / 800 / 200 — a head-heavy language mix
    return spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 6000, "en")
        .when(F.col("id") < 9000, "de")
        .when(F.col("id") < 9800, "es")
        .otherwise("fr")
        .alias("lang"),
    )


class TestTemperatureMix:
    def test_rates_alpha_one_keeps_all(self, skewed):
        rates = {r.lang: r.rate for r in temperature_rates(skewed, "lang", 1.0).collect()}
        assert rates == {"en": 1.0, "de": 1.0, "es": 1.0, "fr": 1.0}
        assert temperature_mix(skewed, "lang", 1.0, salt="t").count() == 10000

    def test_rates_alpha_zero_equalizes(self, skewed):
        # alpha=0: every stratum keeps min_count/count -> kept sizes ~equal
        rates = {r.lang: r.rate for r in temperature_rates(skewed, "lang", 0.0).collect()}
        assert rates["fr"] == 1.0
        assert abs(rates["en"] - 200 / 6000) < 1e-6
        got = {
            r.lang: r.n
            for r in temperature_mix(skewed, "lang", 0.0, salt="t")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got["fr"] == 200  # rate 1.0 exact
        for lang in ("en", "de", "es"):
            assert abs(got[lang] - 200) < 50  # binomial noise around 200

    def test_alpha_half_follows_sqrt_law(self, skewed):
        # kept_s ~ sqrt(c_s) * sqrt(c_min): en/de kept ratio ~ sqrt(2)
        got = {
            r.lang: r.n
            for r in temperature_mix(skewed, "lang", 0.5, salt="t")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got["fr"] == 200  # smallest stratum kept fully
        expected_en = (200 * 6000) ** 0.5  # ~1095
        assert abs(got["en"] - expected_en) / expected_en < 0.1
        assert abs(got["en"] / got["de"] - 2**0.5) < 0.15

    def test_deterministic_and_partition_invariant(self, skewed):
        a = {r.doc_id for r in temperature_mix(skewed, "lang", 0.3, salt="x").collect()}
        b = {
            r.doc_id
            for r in temperature_mix(
                skewed.repartition(13), "lang", 0.3, salt="x"
            ).collect()
        }
        assert a == b

    def test_rates_join_broadcasts(self, skewed):
        plan = (
            temperature_mix(skewed, "lang", 0.5, salt="t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "Python" not in plan

    def test_alpha_validation(self, skewed):
        with pytest.raises(ValueError):
            temperature_rates(skewed, "lang", 1.5)
        with pytest.raises(ValueError):
            temperature_mix(skewed, "lang", -0.1)


class TestTemperatureMixNullStratum:
    def test_null_stratum_is_its_own_stratum(self, spark):
        rows = [(i, "en" if i < 80 else None) for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        # alpha=1 keeps EVERYTHING, null-lang rows included
        assert temperature_mix(df, "lang", 1.0, salt="n").count() == 100
        rates = {r.lang: r.rate for r in temperature_rates(df, "lang", 0.0).collect()}
        assert rates[None] == 1.0  # smallest stratum (20 rows)
        out = temperature_mix(df, "lang", 0.0, salt="n")
        nulls = out.filter(F.col("lang").isNull()).count()
        assert nulls == 20  # rate 1.0 exact, none silently dropped


class TestDeterministicRepeat:
    """deterministic_repeat: per-row multiplicity floor(rate) + one
    hash-decided fractional copy — exact per doc, rate in expectation."""

    def test_exact_per_doc_copies_match_md5_recomputation(self, spark):
        # the cross-engine contract, recomputed independently in pure
        # Python: copies(doc) == floor(rate) + (u < frac(rate)) with
        # u = int(md5(salt||key)[:8], 16) / 2^32 — exact, per doc, over
        # a spread of fractional/integer/sub-1 rates
        import hashlib
        import math

        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 7).cast("double") * 0.37).alias("rate"),
        )
        out = deterministic_repeat(df, "rate", salt="rep")
        got: dict[int, list[int]] = {}
        for r in out.collect():
            got.setdefault(r.doc_id, []).append(r.copy)
        for i in range(2000):
            rate = (i % 7) * 0.37
            u = (
                int(hashlib.md5(f"rep{i}".encode()).hexdigest()[:8], 16)
                / 2**32
            )
            want = math.floor(rate) + (1 if u < rate - math.floor(rate) else 0)
            copies = sorted(got.get(i, []))
            assert copies == list(range(want)), (i, rate, copies, want)

    def test_expected_multiplicity(self, spark):
        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(20000).select(
            F.col("id").alias("doc_id"), F.lit(2.5).alias("rate")
        )
        n = deterministic_repeat(df, "rate", salt="e").count()
        assert abs(n / 20000 - 2.5) < 0.02  # 2 or 3 copies, mean 2.5

    def test_sub_one_rate_subsumes_downsampling(self, spark):
        # rate < 1: floor = 0, keep-one with prob rate — the SAME kept
        # set as hash_sample at the same (salt, key)
        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(5000).select(F.col("id").alias("doc_id"))
        rep = deterministic_repeat(
            df.withColumn("rate", F.lit(0.3)), "rate", salt="s1"
        )
        assert {r.doc_id for r in rep.collect()} == {
            r.doc_id for r in hash_sample(df, 0.3, salt="s1").collect()
        }
        assert rep.groupBy("doc_id").count().filter("count > 1").count() == 0

    def test_partition_invariant(self, spark):
        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 5).cast("double") * 0.61).alias("rate"),
        )
        a = sorted(
            (r.doc_id, r.copy)
            for r in deterministic_repeat(df, "rate", salt="p").collect()
        )
        b = sorted(
            (r.doc_id, r.copy)
            for r in deterministic_repeat(
                df.repartition(13), "rate", salt="p"
            ).collect()
        )
        assert a == b

    def test_no_shuffle_no_python(self, spark):
        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit(1.5).alias("rate")
        )
        plan = (
            deterministic_repeat(df, "rate", salt="x")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


class TestTemperatureRepeat:
    """temperature_repeat: the UPSAMPLING dual of temperature_mix —
    head stratum emits exactly once, tail strata repeat (fractional
    epochs) so emitted sizes follow the c^alpha law."""

    def test_alpha_one_everything_exactly_once(self, skewed):
        from gnames_spark.operators.sampling import temperature_repeat

        out = temperature_repeat(skewed, "lang", 1.0, salt="t")
        assert out.count() == 10000
        assert out.filter(F.col("copy") != 0).count() == 0

    def test_head_stratum_exactly_one_copy(self, skewed):
        from gnames_spark.operators.sampling import temperature_repeat

        out = temperature_repeat(skewed, "lang", 0.5, salt="t")
        en = out.filter(F.col("lang") == "en")
        assert en.count() == 6000  # rate anchored at 1.0: no repeats
        assert en.filter(F.col("copy") != 0).count() == 0

    def test_alpha_zero_equalizes_at_head_count(self, skewed):
        from gnames_spark.operators.sampling import (
            repeat_rates,
            temperature_repeat,
        )

        rates = {
            r.lang: r.rate
            for r in repeat_rates(skewed, "lang", 0.0).collect()
        }
        assert rates["en"] == 1.0  # head anchored at one copy
        assert abs(rates["fr"] - 6000 / 200) < 1e-6
        got = {
            r.lang: r.n
            for r in temperature_repeat(skewed, "lang", 0.0, salt="t")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got["en"] == 6000
        for lang in ("de", "es", "fr"):
            assert abs(got[lang] - 6000) < 120  # fractional-copy noise

    def test_every_doc_survives(self, skewed):
        # repeat rates are >= 1 by construction: upsampling never drops
        from gnames_spark.operators.sampling import temperature_repeat

        out = temperature_repeat(skewed, "lang", 0.3, salt="t")
        assert out.select("doc_id").distinct().count() == 10000

    def test_alpha_half_follows_sqrt_law(self, skewed):
        from gnames_spark.operators.sampling import temperature_repeat

        got = {
            r.lang: r.n
            for r in temperature_repeat(skewed, "lang", 0.5, salt="t")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # emitted_s ~ sqrt(c_s * c_max): fr -> sqrt(200*6000) ~ 1095
        expected_fr = (200 * 6000) ** 0.5
        assert abs(got["fr"] - expected_fr) / expected_fr < 0.1
        assert abs(got["de"] / got["es"] - (3000 / 800) ** 0.5) < 0.15

    def test_deterministic_and_partition_invariant(self, skewed):
        from gnames_spark.operators.sampling import temperature_repeat

        a = sorted(
            (r.doc_id, r.copy)
            for r in temperature_repeat(skewed, "lang", 0.4, salt="x").collect()
        )
        b = sorted(
            (r.doc_id, r.copy)
            for r in temperature_repeat(
                skewed.repartition(13), "lang", 0.4, salt="x"
            ).collect()
        )
        assert a == b

    def test_null_stratum_survives(self, spark):
        from gnames_spark.operators.sampling import temperature_repeat

        rows = [(i, "en" if i < 80 else None) for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = temperature_repeat(df, "lang", 0.0, salt="n")
        # en is the head (80): exactly once; null stratum (20) repeats
        # to ~80 emitted rows
        assert out.filter(F.col("lang") == "en").count() == 80
        nulls = out.filter(F.col("lang").isNull()).count()
        assert abs(nulls - 80) < 15

    def test_rates_join_broadcasts_no_data_shuffle(self, skewed):
        from gnames_spark.operators.sampling import temperature_repeat

        plan = (
            temperature_repeat(skewed, "lang", 0.5, salt="t")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "Python" not in plan

    def test_alpha_validation(self, skewed):
        from gnames_spark.operators.sampling import repeat_rates

        with pytest.raises(ValueError):
            repeat_rates(skewed, "lang", 1.5)

    def test_rate_above_max_rate_fails_fast(self, spark):
        # the bounded-explode claim is ENFORCED: a repeat array is
        # 8 B x rate per row, so absurd rates fail with a message
        # instead of GC-thrashing the executor
        from pyspark.errors import PySparkException

        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit(2e5).alias("rate")
        )
        with pytest.raises(PySparkException, match="max_rate"):
            deterministic_repeat(df, "rate", salt="x").count()
        # raising the cap knowingly is allowed
        n = deterministic_repeat(
            df.withColumn("rate", F.lit(3.0)), "rate", salt="x",
            max_rate=5.0,
        ).count()
        assert n == 30

    def test_null_rate_drops_row_not_job(self, spark):
        # docstring contract: a NULL rate drops the row; it must not
        # trip the max_rate guard (NULL-safe check)
        from gnames_spark.operators.sampling import deterministic_repeat

        df = spark.createDataFrame(
            [(1, 2.0), (2, None), (3, 0.0)], "doc_id long, rate double"
        )
        got = sorted(
            (r.doc_id, r.copy)
            for r in deterministic_repeat(df, "rate", salt="n").collect()
        )
        assert got == [(1, 0), (1, 1)]  # doc 2 (NULL) and 3 (0.0) dropped

    def test_max_rate_plumbs_through_temperature_repeat(self, spark):
        from pyspark.errors import PySparkException

        from gnames_spark.operators.sampling import temperature_repeat

        # head 90 / tail 3 at alpha=0 -> tail rate 30
        rows = [(i, "en" if i < 90 else "xx") for i in range(93)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        with pytest.raises(PySparkException, match="max_rate"):
            temperature_repeat(df, "lang", 0.0, salt="m", max_rate=10).count()
        n = temperature_repeat(df, "lang", 0.0, salt="m", max_rate=50).count()
        assert n >= 93  # allowed once the cap is raised knowingly
