"""Structured-Streaming surface for the dedup engine.

The reference is strictly request/response (SURVEY §2.9 — no
watermarks, no streaming state); production ingestion of a crawl is a
stream, so the engine exposes the streaming-native pieces that make
sense there:

- ``streaming_exact_dedup``: drop byte-identical documents inside a
  watermark window (``dropDuplicatesWithinWatermark`` keyed on
  content sha) — the streaming form of the M1 exact screen. State is
  bounded by the watermark (content seen longer ago than the delay is
  eligible for eviction; global exact dedup stays a batch/backfill
  concern).
- ``streaming_page_stats``: windowed per-language page counts + mean
  quality with late-data tolerance — the metrics surface as a stream.

Near-dup LSH as a pure stream is intentionally NOT offered: candidate
self-joins over an unbounded corpus need the persisted
signatures/buckets tables (stream-static join against the checkpointed
batch state is the supported pattern and works with these same
functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnames_spark.functions.textstats import quality_score


def streaming_exact_dedup(
    pages: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming DataFrame of first-seen documents (exact dedup).

    ``pages`` must be a streaming DF with (url, warc_ts, text, ...).
    """
    return (
        pages.withColumn("content_sha", F.sha2("text", 256))
        .withWatermark("warc_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["content_sha"])
    )


def streaming_page_stats(
    pages: DataFrame,
    window: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Windowed per-lang ingest stats with late-data handling."""
    return (
        pages.withWatermark("warc_ts", watermark_delay)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.round(F.avg(quality_score("text")), 6).alias("avg_quality"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_pages",
            "avg_quality",
        )
    )
