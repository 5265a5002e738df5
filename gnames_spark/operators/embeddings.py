"""Embedding similarity — brute-force cosine top-k + LSH-bucketed ANN.

No reference counterpart (gnames has no vectors); required by the
training-data mandate. Two tiers:

- ``cosine_topk``: exact brute-force baseline. The dot product is pure
  Catalyst (`aggregate(zip_with(...))`) so the cross join's inner loop
  stays in whole-stage codegen. Correct at any scale where one side is
  broadcastable (queries × corpus); the corpus side streams.
- ``hyperplane_buckets`` / ``ann_topk``: random-hyperplane (sign) LSH —
  a seeded hyperplane matrix turns each vector into a b-bit signature;
  candidates share a signature prefix bucket. The scale path: top-k
  within buckets only, trading recall for a corpus-sized × small-k
  join instead of a full cross product.

Kernel note: the hyperplane projection is a numpy matmul inside a
pandas UDF (Arrow-batched), mirroring the MinHash kernel pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def _dot_expr(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0.0D, (acc, v) -> acc + v)"


def _norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_similarity_col(a: str, b: str) -> F.Column:
    """cos(a, b) as a pure Catalyst column (no UDF)."""
    return F.expr(
        f"CASE WHEN {_norm_expr(a)} = 0.0D OR {_norm_expr(b)} = 0.0D THEN 0.0D "
        f"ELSE {_dot_expr(a, b)} / ({_norm_expr(a)} * {_norm_expr(b)}) END"
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force baseline).

    queries is broadcast (the small side); ordering ties broken by
    neighbor id after rounding — fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    joined = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_similarity_col("_qv", "_cv"), round_digits))
        .drop("_qv", "_cv")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def make_hyperplane_udf(dim: int, n_bits: int, seed: int):
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) >= 0
        weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
        packed = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.view(np.int64))

    return sig


def hyperplane_buckets(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, bucket) — sign-LSH signature as bucket key."""
    sig = make_hyperplane_udf(dim, n_bits, seed)
    return vectors.withColumn("bucket", sig(F.col(vec_col)))


def ann_topk(
    vectors: DataFrame,
    dim: int,
    k: int,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per vector: candidates limited to the same
    sign-LSH bucket (self-join on bucket — the J1 posting shape again),
    exact cosine within the bucket. The 10^12-scale path: bucket width
    controls the candidate blow-up; multiple probe tables (different
    seeds) raise recall the way LSH bands do."""
    b = hyperplane_buckets(vectors, dim, n_bits, seed, id_col, vec_col)
    lhs = b.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    rhs = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "bucket"
    )
    joined = (
        lhs.join(rhs, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_similarity_col("_qv", "_cv"), 6))
        .drop("_qv", "_cv", "bucket")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).
    Exact via self cross join — the oracle-grade form; swap the join
    input for `hyperplane_buckets` output at scale."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity_col("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .drop("_va", "_vb")
    )
