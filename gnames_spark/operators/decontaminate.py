"""Benchmark decontamination — corpus-vs-reference n-gram screening.

The training-data operation the dedup family does NOT cover: remove
(or flag) corpus documents that overlap an EVALUATION set, so the
model is never trained on its own test questions. Unlike dedup this
is asymmetric (corpus × reference, never corpus × corpus) and uses a
long token n-gram (13 by convention — long enough that a shared gram
is quotation, not coincidence) with exact string matching instead of
a similarity threshold.

No reference counterpart (gnames has no train/eval split); required by
the training-data mandate's dedup/curation family. Public-knowledge
method: verbatim n-gram collision screening as practiced by open LLM
data pipelines.

Scale shape: reference grams come from eval SUITES — thousands of
documents, millions of grams at most — so the gram table broadcasts
(and when it doesn't, the equi-join degrades gracefully to a shuffled
hash join on the gram key; AQE decides). The corpus side streams one
exploded gram row per (doc, distinct gram) — no corpus self-join, no
state. `array_distinct` before the explode keeps a doc repeating one
benchmark sentence from inflating its match count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnames_spark.functions.shingles import shingle_strings


def contamination_matches(
    corpus: DataFrame,
    reference: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_matches: int = 1,
) -> DataFrame:
    """(doc_id, n_matched_grams) for corpus docs sharing >=
    ``min_matches`` DISTINCT n-token grams with the reference set.

    ``n_matched_grams`` counts distinct shared grams — the triage
    signal (1 shared 13-gram = likely quotation; dozens = the document
    IS the benchmark). Docs shorter than n tokens produce no grams and
    can never be flagged (the quotation they could contain is shorter
    than the screen's evidence unit — documented miss class, same
    honesty as the LSH threshold classes)."""
    ref_grams = (
        reference.select(
            F.explode(F.array_distinct(shingle_strings(text_col, n))).alias("gram")
        )
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingle_strings(text_col, n))).alias("gram"),
    )
    return (
        doc_grams.join(ref_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched_grams"))
        .filter(F.col("n_matched_grams") >= int(min_matches))
    )


def decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_matches: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Split the corpus into (clean, contaminated). ``contaminated``
    carries ``n_matched_grams``; ``clean`` is the corpus minus flagged
    ids (anti join — the flagged set is tiny relative to the corpus,
    so the corpus is scanned once, never shuffled by this operator)."""
    flagged = contamination_matches(
        corpus, reference, n, id_col, text_col, min_matches
    )
    contaminated = corpus.join(flagged, id_col)
    clean = corpus.join(flagged.select(id_col), id_col, "left_anti")
    return clean, contaminated
