"""Cluster representative selection.

Reference analog: BestResult per name — after clustering, one canonical
record is chosen per group by a deterministic ordering
(`/root/reference/pkg/gnames_verif.go:82-107`; group-internal ordering
`/root/reference/pkg/ent/lexgroup/lexgroup.go:398-418`). Here: one
kept document per duplicate cluster, the rest are marked duplicates —
the actual *deliverable* of a training-data dedup pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def select_representatives(
    components: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """(doc_id, component_id) [+ doc attrs] → + (is_representative, rep_doc).

    Default policy: smallest doc_id wins (deterministic). Pass
    ``order_cols`` (e.g. [F.desc("quality"), F.asc("doc_id")]) for a
    quality-first policy — the analog of the reference ordering groups
    by has-authors-first then arrival index (W3 in SURVEY §2.5). Any
    ordering MUST end in a unique column; we append doc_id defensively.
    """
    df = components
    if docs is not None:
        df = df.join(docs, df["doc_id"] == docs[id_col], "left").drop(docs[id_col])
    ordering = list(order_cols or []) + [F.asc("doc_id")]
    w = W.partitionBy("component_id").orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_representative", F.col("_rn") == 1)
        .withColumn(
            "rep_doc",
            F.min(F.when(F.col("_rn") == 1, F.col("doc_id"))).over(
                W.partitionBy("component_id")
            ),
        )
        .drop("_rn")
    )


def cluster_summary(components: DataFrame) -> DataFrame:
    """(component_id, n_docs, rep_doc) — cluster-level report (the
    LexicalGroup header analog: id + member count,
    `/root/reference/pkg/ent/lexgroup/lexgroup.go:17-41`)."""
    return components.groupBy("component_id").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )


def dedup_keep_list(components: DataFrame) -> DataFrame:
    """doc_ids to KEEP (one per cluster) — the pipeline's final output."""
    return (
        components.groupBy("component_id")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
