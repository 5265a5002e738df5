"""Source readers — the engine's ingest boundary.

Reference analog: gnames separates ingestion (PG tables, matcher cache
dirs) from query logic; here every driver query and the pipeline load
their inputs through these helpers so the storage layout (parquet in
the sandbox, Iceberg tables in production per north_rule) is swapped in
ONE place. ``read_pages`` is the pipeline entry: an Iceberg/parquet
table of Common-Crawl-style web pages with columns
(url string, warc_ts timestamp, html binary, text string, lang string)
— extra columns pass through; ``html`` is consumed and dropped by
DedupPipeline.prepare_docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One synthetic benchmark table (parquet layout: <sf_dir>/<name>.parquet)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def read_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


def read_pages(
    spark: SparkSession, source: str, fmt: str = "parquet", **options
) -> DataFrame:
    """Web-page table for the dedup pipeline.

    ``fmt='parquet'`` reads a path; ``fmt='iceberg'`` treats ``source``
    as a catalog table name (production path — requires the
    iceberg-spark-runtime jar on the cluster, unavailable in this
    sandbox; exercised there via spark.table on the configured catalog).
    """
    if fmt == "iceberg":  # pragma: no cover - no Iceberg jar in sandbox
        return spark.table(source)
    return spark.read.format(fmt).options(**options).load(source)
