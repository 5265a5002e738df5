"""Exact (byte-identical) dedup — the cheapest screen, run first.

Reference analog: the bloom-filter exact-match level that gnmatcher
consults before any fuzzy work (`/root/reference/PLAN_gnmatcher_embed.md:14-18`),
and the UUIDv5 content identity of a name string
(`/root/reference/pkg/gnames_verif.go:48`). Here identity is
sha2-256 of the extracted text — computed JVM-side, no UDF.

Scale notes: `groupBy(content_sha)` is one shuffle with map-side
partial aggregation. Exact-dup *pairs* are emitted as star edges
(every member → group-min doc), not all-pairs — a group of n byte-
identical boilerplate pages yields n-1 edges, not n(n-1)/2, and the
star is exactly what connected components needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def with_content_sha(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add deterministic content identity (sha2-256 hex of text)."""
    return docs.withColumn("content_sha", F.sha2(F.col(text_col), 256))


def exact_groups(docs_sha: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(content_sha, n_docs, rep_doc) — one row per distinct content."""
    return docs_sha.groupBy("content_sha").agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("rep_doc"),
    )


def exact_dup_edges(docs_sha: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Star edges (doc_a=group min, doc_b=member) for byte-identical docs.

    Window-min over the sha partition avoids a join back; only groups
    with >1 member emit edges.
    """
    w = W.partitionBy("content_sha")
    return (
        docs_sha.select(id_col, "content_sha")
        .withColumn("doc_a", F.min(id_col).over(w))
        .withColumn("n", F.count("*").over(w))
        .filter((F.col("n") > 1) & (F.col(id_col) != F.col("doc_a")))
        .select(
            F.col("doc_a"),
            F.col(id_col).alias("doc_b"),
            F.lit("exact").alias("method"),
        )
    )


def distinct_content(docs_sha: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One representative row per distinct content — the early-exit
    cascade (P3 in SURVEY §4): docs already matched byte-identically
    skip the MinHash/SimHash branches entirely; their cluster membership
    is recovered through the exact star edges. Shrinks N for every
    downstream stage (the reference's exact-hit-suppresses-fuzzy rule,
    `/root/reference/README.md:188-195`).
    """
    w = W.partitionBy("content_sha").orderBy(F.col(id_col))
    return (
        docs_sha.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
