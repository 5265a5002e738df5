"""Pair scoring + ranking — bit-packed deterministic sort keys.

Reference analog: the 32-bit packed multi-criteria score with stable
sort and best-result-with-ties selection
(`/root/reference/pkg/ent/score/score_calc.go:112-124` packs 7 criteria
at fixed shifts; `/root/reference/pkg/ent/score/score.go:45-66` sorts;
`/root/reference/pkg/gnames_verif.go:82-107` takes the head + ties).

The dedup pair score packs (method strength, Jaccard bucket, inverse
Hamming) into one int64 so ordering is total and deterministic — pure
Column math, no UDF (the reference's score is likewise pure bit ops).

Layout (high → low):
  bits 62-60: method rank   (exact=7, suffix=5, lsh=3, simhash=2)
  bits 59-50: jaccard*1000 bucketed to 10 bits
  bits 49-43: 127 - min(hamming,127) (7 bits; 127 when no simhash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

METHOD_RANK = {"exact": 7, "suffix": 5, "embedding": 4, "lsh": 3, "simhash": 2}


def method_rank_col(method_col: str = "method") -> Column:
    expr = F.lit(1)
    for m, v in METHOD_RANK.items():
        expr = F.when(F.col(method_col) == m, F.lit(v)).otherwise(expr)
    return expr


def pair_score(
    method_col: str = "method",
    jaccard_col: str = "jaccard",
    hamming_col: str | None = "hamming",
) -> Column:
    """Bit-packed int64 score; higher = stronger duplicate evidence."""
    mrank = method_rank_col(method_col).cast("long")
    jbucket = F.least(
        F.round(F.coalesce(F.col(jaccard_col), F.lit(0.0)) * 1000).cast("long"),
        F.lit(1000),
    )
    if hamming_col is not None:
        ham = F.coalesce(F.col(hamming_col).cast("long"), F.lit(127))
    else:
        ham = F.lit(127)
    inv_ham = F.lit(127) - F.least(ham, F.lit(127))
    return (
        F.shiftleft(mrank, 60)
        + F.shiftleft(jbucket, 50)
        + F.shiftleft(inv_ham, 43)
    )


def unpack_score(score_col: str = "score") -> list[Column]:
    """Mask+shift the packed score back to per-criterion values — the
    reporting half (X16; reference
    `/root/reference/pkg/ent/score/score.go:82-93` extracts each
    criterion with the same shift/mask arithmetic for its details
    struct). Inverse of :func:`pair_score`'s layout."""
    s = F.col(score_col)
    return [
        F.shiftrightunsigned(s, 60).bitwiseAND(F.lit(7)).alias("method_rank"),
        F.shiftrightunsigned(s, 50).bitwiseAND(F.lit(1023)).alias("jaccard_bucket"),
        F.shiftrightunsigned(s, 43).bitwiseAND(F.lit(127)).alias("inv_hamming"),
    ]


def sort_score(score_col: str = "score") -> Column:
    """log10 of the packed score — the reference's SortScore analog
    (`/root/reference/pkg/ent/score/score.go:39-41`)."""
    return F.when(F.col(score_col) > 0, F.log10(F.col(score_col))).otherwise(F.lit(0.0))


def best_match_per_doc(
    scored_pairs: DataFrame, keep_ties: bool = True, doc_col: str = "doc_a"
) -> DataFrame:
    """Best-scoring duplicate partner per doc, keeping ties.

    `rank()` (not row_number) keeps ties — the BestResults-with-equal-
    SortScore semantics of `/root/reference/pkg/gnames_verif.go:92-107`.
    The ORDER BY includes doc_b as an explicit tiebreak column because
    Spark sorts are not stable (the reference leaned on Go's stable
    sort; W1 in SURVEY §2.5).
    """
    if keep_ties:
        # rank over score alone: equal scores share rank 1 (BestResults ties)
        w = W.partitionBy(doc_col).orderBy(F.desc("score"))
        fn = F.rank()
    else:
        # deterministic single winner: explicit unique tiebreak column,
        # because Spark sorts are not stable (the reference leaned on
        # Go's stable sort)
        w = W.partitionBy(doc_col).orderBy(F.desc("score"), F.asc("doc_b"))
        fn = F.row_number()
    return (
        scored_pairs.withColumn("_rk", fn.over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
