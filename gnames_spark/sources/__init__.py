from gnames_spark.sources.tables import (
    TPCH_TABLES,
    read_documents,
    read_embeddings,
    read_events,
    read_pages,
    read_table,
)

__all__ = [
    "TPCH_TABLES",
    "read_documents",
    "read_embeddings",
    "read_events",
    "read_pages",
    "read_table",
]
