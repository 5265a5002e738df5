"""Exact verification of candidate pairs — Jaccard on shingle sets.

Reference analog: hydration + edit-distance screening — candidates from
the approximate index are joined back to ground truth and filtered
(`/root/reference/internal/io/pgio/match_records_map.go:31-35` is the
join-back, `:75-92` the EditDistance <= 5 cutoff). Here the join-back
target is the `shingle_sets` table and the cutoff is
``jaccard >= cfg.jaccard_threshold``.

The intersection count runs in a vectorized pandas UDF:
``size(array_intersect)/size(array_union)`` is declaratively cleaner
but Spark's implementation builds a hash set per row — measured ~30 s
for 664k pairs of ~300-element sets at 32 cores, vs ~2 s for
``np.intersect1d`` over Arrow batches.

Scale notes: two shuffled joins (pairs⋈sets on doc_a, then on doc_b).
The shingle-set arrays ride the shuffle once each; at 10^12 docs one
would bucket `shingle_sets` by doc_id (Iceberg sorted/bucketed layout)
so both joins co-locate — noted in plans/. AQE handles residual skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gnames_spark.config import DedupConfig


@F.pandas_udf(T.DoubleType())
def _jaccard_udf(set_a: pd.Series, set_b: pd.Series) -> pd.Series:
    """Exact Jaccard of two int64 arrays per row.

    PRECONDITION: both arrays contain DISTINCT elements — |A| is taken
    as len(A) and the intersection uses assume_unique=True, so duplicate
    elements give silently wrong values. Every in-repo producer
    satisfies this (shingle_set/make_shingle_set_udf apply
    array_distinct/np.unique); external callers of verify_pairs must
    pass set-valued columns. (The kernel's >>1 range shift could in
    principle collide two distinct hashes post-unique — probability
    ~2^-63 per pair, accepted.)"""
    out = np.zeros(len(set_a), dtype=np.float64)
    for i, (a, b) in enumerate(zip(set_a, set_b)):
        if a is None or b is None:
            continue
        na, nb = len(a), len(b)
        if na == 0 or nb == 0:
            continue
        ni = len(np.intersect1d(a, b, assume_unique=True))
        out[i] = ni / (na + nb - ni)
    return pd.Series(out)


def verify_pairs(
    candidates: DataFrame,
    shingle_sets: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    set_col: str = "shingle_set",
) -> DataFrame:
    """(doc_a, doc_b, method) → + (jaccard, passed).

    Exact Jaccard over the distinct-shingle sets of both docs; pairs
    whose either side has an empty set get jaccard 0.0 (they can only
    be duplicates via the exact or substring paths). ``set_col`` MUST
    hold distinct elements per row (see _jaccard_udf precondition).
    """
    sets_a = shingle_sets.select(
        F.col(id_col).alias("doc_a"), F.col(set_col).alias("_set_a")
    )
    sets_b = shingle_sets.select(
        F.col(id_col).alias("doc_b"), F.col(set_col).alias("_set_b")
    )
    joined = candidates.join(sets_a, "doc_a", "inner").join(sets_b, "doc_b", "inner")
    return (
        joined.withColumn("jaccard", _jaccard_udf("_set_a", "_set_b"))
        .withColumn("passed", F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
        .drop("_set_a", "_set_b")
    )


def exact_jaccard_pairs(
    shingle_sets: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "shingle_set",
    min_shared: int = 1,
) -> DataFrame:
    """EXACT all-pairs Jaccard >= threshold, without a cross join.

    Any pair with jaccard > 0 shares >= 1 shingle, so the exact
    candidate set is the self-join of the exploded (shingle, doc)
    posting list — the same J1 posting-list shape. Intersection sizes
    come from the group count, union from |A|+|B|-|A∩B|; no arrays are
    shuffled. This is the *oracle-grade* exact algorithm (used by the
    recall gate and the DuckDB-comparable query); LSH replaces it at
    scale only because the posting-list join explodes on huge corpora.
    """
    sized = shingle_sets.select(id_col, F.size(set_col).alias("_n"), set_col)
    posting = sized.select(
        F.col(id_col), F.col("_n"), F.explode(set_col).alias("shingle")
    )
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, "shingle", "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(F.col("n_inter") >= min_shared)
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    shingle_sets: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    set_col: str = "shingle_set",
    min_shared: int = 1,
) -> DataFrame:
    """EXACT all-pairs shingle CONTAINMENT >= threshold:
    |A ∩ B| / min(|A|, |B|) — "the smaller document is this contained
    in the larger". The dup class Jaccard structurally misses: a short
    page quoted whole inside a long one has J <= |A|/|B| no matter how
    perfect the inclusion (the verify stage's size-ratio prefilter
    PRUNES exactly those pairs, by design — containment is the
    complementary detector for them; reference analog: PartialExact
    match type, /root/reference/pkg/ent/verifier/verifier.go match
    kinds, which the suffix pass covers only for CONTIGUOUS overlap —
    containment also catches scattered inclusion, e.g. a quote split
    by interjections).

    Same posting-list shape as :func:`exact_jaccard_pairs` (no arrays
    shuffled, no cross join); at crawl scale run it on LSH/anchor
    candidates rather than all pairs, exactly like the Jaccard verify.
    """
    sized = shingle_sets.select(id_col, F.size(set_col).alias("_n"), set_col)
    posting = sized.select(
        F.col(id_col), F.col("_n"), F.explode(set_col).alias("shingle")
    )
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, "shingle", "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(F.col("n_inter") >= min_shared)
    )
    cont = F.col("n_inter").cast("double") / F.least("n_a", "n_b").cast("double")
    return (
        inter.withColumn("containment", cont)
        .filter(F.col("containment") >= F.lit(threshold))
        .select("doc_a", "doc_b", "containment")
    )
