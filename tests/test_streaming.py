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
