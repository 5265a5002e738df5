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


def blocked_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """EXACT all pairs with cosine >= threshold, with NO crossJoin.

    Block-pair GEMM: vectors are hashed into ``n_blocks`` blocks; each
    of the B(B+1)/2 unordered block pairs becomes one ``applyInPandas``
    group whose task runs a single numpy matmul over (|block_a| ×
    |block_b|) normalized vectors. Every vector is replicated to the B
    block pairs containing its block (the unavoidable replication
    factor of exact all-pairs blocking — pick B ≈ sqrt(2·tasks) so
    task memory holds 2·n/B vectors), every unordered pair of ids
    meets in EXACTLY one group, and the O(n²) work is spread evenly
    over B(B+1)/2 tasks instead of one nested-loop join.

    The GEMM emits candidates at (threshold − 1e-6) and the final
    cosine is recomputed with the Catalyst fold expression — bitwise
    identical to the sequential-sum DuckDB oracle, immune to
    BLAS-vs-sequential last-ulp drift at the threshold boundary.

    Reference shape analog: candidate index before exact verify
    (/root/reference/PLAN_gnmatcher_embed.md:14-19).
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    spark = vectors.sparkSession
    edges = (
        spark.range(n_blocks)
        .select(F.col("id").alias("ba"))
        .join(spark.range(n_blocks).select(F.col("id").alias("bb")), F.lit(True))
        .filter(F.col("ba") <= F.col("bb"))
    )
    # replicate each vector into every block pair that contains its block
    lhs = edges.join(v, v.blk == edges.ba).select("ba", "bb", "vid", "vec").withColumn(
        "side", F.lit(0)
    )
    rhs = edges.join(v, v.blk == edges.bb).select("ba", "bb", "vid", "vec").withColumn(
        "side", F.lit(1)
    )
    tagged = lhs.unionByName(rhs)
    margin = float(threshold) - 1e-6

    def gemm(key, pdf: pd.DataFrame):
        ba, bb = key
        same = ba == bb
        if same:
            # both sides carry the identical block; drop the duplicate copy
            pdf = pdf[pdf["side"] == 0]
            ids_a = pdf["vid"].to_numpy()
            A = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["vec"]])
            ids_b, B = ids_a, A
        else:
            pa = pdf[pdf["side"] == 0]
            pb = pdf[pdf["side"] == 1]
            if len(pa) == 0 or len(pb) == 0:
                return pd.DataFrame({"id_a": [], "id_b": []})
            ids_a = pa["vid"].to_numpy()
            ids_b = pb["vid"].to_numpy()
            A = np.stack([np.asarray(x, dtype=np.float64) for x in pa["vec"]])
            B = np.stack([np.asarray(x, dtype=np.float64) for x in pb["vec"]])
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        na[na == 0] = np.inf  # zero vectors: cosine defined as 0 -> never pass
        nb[nb == 0] = np.inf
        sims = (A / na[:, None]) @ (B / nb[:, None]).T
        ii, jj = np.nonzero(sims >= margin)
        ia, ib = ids_a[ii], ids_b[jj]
        keep = ia != ib
        if same:
            keep &= ia < ib
        lo = np.minimum(ia[keep], ib[keep])
        hi = np.maximum(ia[keep], ib[keep])
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    cands = tagged.groupBy("ba", "bb").applyInPandas(gemm, schema="id_a long, id_b long")
    # exact join-back cosine (Catalyst sequential fold == oracle rounding)
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_similarity_col("_va", "_vb"), round_digits))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ann_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_bits: int = 12,
    seeds: tuple[int, ...] = (42, 1042, 2042),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """APPROXIMATE near-dup pairs: multi-probe sign-LSH — one bucket
    table per seed, union of in-bucket exact-cosine pairs. The
    10^12-scale sub-quadratic path (candidate volume ∝ bucket sizes,
    not n²); recall vs the exact blocked path is measured by
    tools/ann_recall.py and reported in BENCH.md, the way LSH banding
    recall is derived for MinHash."""
    out = None
    for seed in seeds:
        b = hyperplane_buckets(vectors, dim, n_bits, seed, id_col, vec_col)
        lhs = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "bucket")
        rhs = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "bucket")
        pairs = (
            lhs.join(rhs, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_va", "_vb")
        )
        out = pairs if out is None else out.unionByName(pairs)
    return (
        out.dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", F.round(cosine_similarity_col("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).
    Exact, via :func:`blocked_cosine_pairs` — the previous self
    crossJoin form is gone (it was the one checked path that could not
    survive 100×; the blocked form is the same exact result with the
    work spread over block-pair tasks)."""
    return blocked_cosine_pairs(vectors, threshold, n_blocks, id_col, vec_col)
