"""Structured Streaming smoke tests: parquet source → memory sink,
driven synchronously with processAllAvailable (the pyspark guide's
local pattern)."""

import pytest
from pyspark.sql import functions as F

from gnames_spark.corpus import PAGES_SCHEMA, generate_pages
from gnames_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
    streaming_page_stats,
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
