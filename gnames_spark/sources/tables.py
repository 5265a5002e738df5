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


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a BUCKETED table so every later equi-join or
    aggregation on ``bucket_col`` is exchange-free: both sides of a
    join bucketed by the same column into the same bucket count
    co-locate, and the scan reports hashpartitioning so Catalyst plans
    no shuffle (asserted in tests/test_plans.py).

    This is the parquet stand-in for Iceberg's ``bucket(n, col)``
    partition transform at production scale (north_rule): stage tables
    that are re-joined repeatedly (signatures, shingle sets, candidate
    pairs keyed by doc id) pay their doc_id shuffle ONCE at write time
    instead of on every downstream join — at 10^12 docs the dominant
    repeated cost. ``sort`` additionally orders within buckets so
    sort-merge joins skip the sort.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


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
