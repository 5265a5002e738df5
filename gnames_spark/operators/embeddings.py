"""Embedding similarity — brute-force cosine top-k + LSH-bucketed ANN.

No reference counterpart (gnames has no vectors); required by the
training-data mandate. Two tiers:

- ``cosine_topk``: exact brute-force baseline. The dot product is pure
  Catalyst (`aggregate(zip_with(...))`) so the cross join's inner loop
  stays in whole-stage codegen. Correct at any scale where one side is
  broadcastable (queries × corpus); the corpus side streams.
- ``ann_dup_pairs`` / ``ann_topk``: banded random-hyperplane (sign)
  LSH — n_bands buckets of band_bits hyperplane signs per vector
  (width and count derived from the threshold and the corpus size),
  posting-list self-join per (band, bucket), exact-cosine verify on
  the deduped candidates. The scale path: candidate volume ∝ bucket
  sizes × bands, never n²; recall at the target cosine is >= 0.99 by
  banding construction and measured (ANN_RECALL.json).

Kernel note: the hyperplane projection is a numpy matmul inside a
pandas UDF (Arrow-batched), mirroring the MinHash kernel pattern.
"""

from __future__ import annotations

import math

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


def ann_topk(
    vectors: DataFrame,
    dim: int,
    k: int,
    min_cosine: float = 0.7,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int | None = None,
    band_bits: int = 8,
    n_vectors_hint: int | None = None,
    bucket_cap: int | None = None,
    round_digits: int = 6,
    filter_below_min: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Approximate top-k per vector via the SAME multi-band sign-LSH
    machinery as :func:`ann_dup_pairs` — banding derived from
    ``min_cosine`` (and, with ``n_vectors_hint``, from corpus size so
    band width grows with log2(n); ANN_SCALE.json shows fixed-width
    banding goes quadratic). Candidates are the UNION of all band
    buckets a vector lands in, scored with exact Catalyst cosine on
    join-back hydration, then ranked per query. Returns
    ``(topk, overflow_buckets)``.

    Characterized miss class (the reference documents its fuzzy-clamp
    false negatives the same way, /root/reference/README.md:197-203):
    a true neighbor with cosine >= min_cosine is caught with
    probability >= 0.99 (the banding is derived from exactly that
    constraint); true top-k entries BELOW min_cosine may be missing —
    they are reported when a band happens to catch them, guaranteed
    never. Measured recall vs :func:`cosine_topk`:
    tools/ann_recall.py → ANN_RECALL.json (ann_topk section).

    ``filter_below_min=True`` ranks only neighbors with cosine >=
    min_cosine — the thresholded-top-k form whose result is exactly
    reproducible by a brute-force SQL oracle (driver query
    ``emb_ann_topk``).

    Scale shape: identical to ann_dup_pairs — postings carry only
    (band, bucket, vid); candidate pairs dedup BEFORE hydration; each
    unordered pair scores its cosine once and is mirrored to both
    query directions; the per-query window ranks a bucket-bounded
    candidate list, never the corpus."""
    cands, overflow = _banded_candidate_pairs(
        vectors, min_cosine, dim, n_bands, band_bits, seed,
        id_col, vec_col, bucket_cap, n_vectors_hint, round_digits,
    )
    if filter_below_min:
        cands = cands.filter(F.col("cosine") >= min_cosine)
    mirrored = cands.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        cands.select(
            F.col("id_b").alias("query_id"),
            F.col("id_a").alias("neighbor_id"),
            "cosine",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    topk = mirrored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return topk, overflow


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

    def gemm(key: tuple[int, int], pdf: pd.DataFrame) -> pd.DataFrame:
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


def signlsh_bit_agreement(cosine: float) -> float:
    """P(one random hyperplane puts two vectors with this cosine on the
    same side) = 1 − θ/π (Goemans–Williamson / Charikar 2002)."""
    c = min(1.0, max(-1.0, float(cosine)))
    return 1.0 - math.acos(c) / math.pi


def signlsh_catch_probability(cosine: float, bands: int, bits: int) -> float:
    """P(≥1 shared band bucket) = 1 − (1 − p^bits)^bands — the sign-LSH
    analog of config.lsh_catch_probability for MinHash banding."""
    p = signlsh_bit_agreement(cosine)
    return 1.0 - (1.0 - p**bits) ** bands


def optimal_sign_bands(
    threshold: float,
    band_bits: int = 8,
    target_recall: float = 0.99,
    max_bands: int = 256,
) -> int:
    """Fewest bands of ``band_bits`` hyperplanes whose catch probability
    at cosine == ``threshold`` reaches ``target_recall`` (pairs above
    the threshold catch strictly more often). Derived from the recall
    target exactly like config.optimal_bands derives MinHash banding;
    capped at max_bands because candidate volume grows ∝ bands."""
    p_band = signlsh_bit_agreement(threshold) ** band_bits
    if p_band >= 1.0:
        return 1
    if p_band <= 0.0:
        return max_bands
    need = math.log(1.0 - target_recall) / math.log(1.0 - p_band)
    return max(1, min(max_bands, math.ceil(need)))


def derive_sign_banding(
    threshold: float,
    n_vectors: int,
    target_recall: float = 0.99,
    candidates_per_vec: float = 8.0,
    max_bands: int = 256,
    max_bits: int = 32,
) -> tuple[int, int]:
    """Jointly derive (band_bits, n_bands) from the threshold AND the
    corpus size.

    Why band WIDTH must scale with n (measured, ANN_SCALE.json): with
    fixed r-bit bands the random-collision candidate volume is
    bands · n²/2 · 2^-r — still Θ(n²), just with a small constant; at
    100k random 64-dim vectors the 8-bit default produced ~avg-390
    buckets and the "sub-quadratic" path ran 9× slower than the exact
    GEMM. Sub-quadratic behavior requires 2^r ≳ n: this picks the
    cheapest (bits, bands) pair — cost modeled as bands·bits, the
    hyperplane/posting volume — such that (a) catch probability at
    cosine == threshold reaches ``target_recall`` within ``max_bands``
    and (b) expected random collisions bands·n·2^-bits stay under
    ``candidates_per_vec`` (2^-bits is the per-band collision rate of
    ISOTROPIC vectors; real embedding corpora are correlated, which is
    what the bucket_cap + overflow log absorb).

    Loose thresholds are honestly expensive: at τ≈0.4 no (bits ≤ 32,
    bands ≤ max_bands) pair satisfies both constraints for large n —
    the fallback keeps recall (constraint a) and accepts the candidate
    volume, because dropping recall silently is never acceptable
    (north_rule)."""
    best = None
    fallback = None
    for bits in range(4, max_bits + 1):
        bands = optimal_sign_bands(threshold, bits, target_recall, max_bands)
        if signlsh_catch_probability(threshold, bands, bits) < target_recall:
            break  # wider bands only get harder to catch with — stop
        # collision rate bands·2^-bits falls monotonically with bits
        # (bands grows slower than 2^bits), so the LAST recall-feasible
        # bits is the fewest-false-candidates fallback
        fallback = (bits, bands, bands * bits)
        if bands * n_vectors * 2.0 ** (-bits) > candidates_per_vec:
            continue
        cost = bands * bits
        if best is None or cost < best[2]:
            best = (bits, bands, cost)
    chosen = best or fallback or (8, optimal_sign_bands(threshold, 8, target_recall, max_bands), 0)
    return chosen[0], chosen[1]


def make_banded_hyperplane_udf(dim: int, n_bands: int, band_bits: int, seed: int):
    """pandas UDF: vector → array<long> of n_bands bucket hashes — each
    band packs ``band_bits`` hyperplane signs (one (dim × b·r) matmul
    per Arrow batch)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_bands * band_bits)).astype(np.float64)
    weights = (np.uint64(1) << np.arange(band_bits, dtype=np.uint64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bands_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = ((mat @ planes) >= 0).astype(np.uint64)
        packed = (
            bits.reshape(len(mat), n_bands, band_bits) * weights[None, None, :]
        ).sum(axis=2, dtype=np.uint64).astype(np.int64)
        return pd.Series(list(packed))

    return bands_udf


def _banded_candidate_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_bands: int | None,
    band_bits: int,
    seed: int,
    id_col: str,
    vec_col: str,
    bucket_cap: int | None,
    n_vectors_hint: int | None,
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Shared sign-LSH candidate machinery for :func:`ann_dup_pairs` and
    :func:`ann_topk`: derive banding from (threshold, corpus size),
    posting self-join per (band, bucket) with the hot-bucket cap,
    dedup candidates, hydrate vectors by join-back and score exact
    cosine. Returns ``(candidates_with_cosine, overflow_buckets)`` —
    candidates are UNFILTERED by the threshold (top-k ranks below-
    threshold collisions too; the pair miner filters)."""
    if n_bands is None:
        if n_vectors_hint is not None:
            band_bits, n_bands = derive_sign_banding(threshold, n_vectors_hint)
        else:
            n_bands = optimal_sign_bands(threshold, band_bits)
    sig = make_banded_hyperplane_udf(dim, n_bands, band_bits, seed)
    posting = vectors.select(
        F.col(id_col).alias("vid"),
        F.posexplode(sig(F.col(vec_col))).alias("band", "bucket"),
    )
    spark = vectors.sparkSession
    if bucket_cap is not None:
        counts = posting.groupBy("band", "bucket").agg(F.count("*").alias("n_vecs"))
        overflow = counts.filter(F.col("n_vecs") > bucket_cap)
        posting = posting.join(
            overflow.select("band", "bucket"), ["band", "bucket"], "left_anti"
        )
    else:
        overflow = spark.createDataFrame([], "band int, bucket long, n_vecs long")
    lhs = posting.select("band", "bucket", F.col("vid").alias("id_a"))
    rhs = posting.select("band", "bucket", F.col("vid").alias("id_b"))
    cands = (
        lhs.join(rhs, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    scored = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine", F.round(cosine_similarity_col("_va", "_vb"), round_digits)
        )
        .select("id_a", "id_b", "cosine")
    )
    return scored, overflow


def ann_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_bands: int | None = None,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = None,
    n_vectors_hint: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """APPROXIMATE near-dup pairs: BANDED sign-LSH — n_bands buckets of
    band_bits hyperplane signs per vector, posting-list self-join per
    (band, bucket), exact-cosine verify on the candidates. Returns
    (pairs, overflow_buckets).

    The 10^12-scale sub-quadratic path: candidate volume ∝ bucket
    sizes × bands, never n². ``n_bands`` defaults to the fewest bands
    whose catch probability at cosine == threshold is ≥ 0.99
    (:func:`optimal_sign_bands` — the same recall-derived banding as
    MinHash LSH in config.py; a loose threshold like 0.4 needs ~180
    bands of 8 bits, a near-dup threshold like 0.9 needs ~14, so the
    cost of the index tracks how hard the query is). Measured recall
    vs the exact blocked path: tools/ann_recall.py → ANN_RECALL.json.

    ``n_vectors_hint``: pass the (approximate) corpus size to derive
    BOTH band_bits and n_bands via :func:`derive_sign_banding` — band
    width then grows with log2(n) so random-collision candidate volume
    stays ~linear (measured: with the fixed 8-bit default the path
    goes quadratic past ~10^4 vectors, ANN_SCALE.json). Explicit
    ``n_bands``/``band_bits`` win over the hint; the hint is the knob
    every at-scale caller should set.

    ``bucket_cap``: drop (band, bucket) postings holding more than this
    many vectors (returned in overflow, never silent) — same hot-bucket
    policy as lsh.capped_buckets; dense embedding regions otherwise
    create quadratic bucket blow-ups at crawl scale.

    Plan shape: the posting table carries ONLY (band, bucket, vid) —
    never the vector — so the n_bands-way explode shuffles ~20 bytes
    per posting instead of replicating the embedding n_bands times
    (at 181 bands × 768 floats that replication would be ~1 MB/vector
    through the exchange). Vectors are hydrated by joining back on
    vec_id for just the DEDUPED candidate pairs — the same join-back
    hydration economics as the text pipeline's shingle-set recompute
    (pipeline.verified)."""
    scored, overflow = _banded_candidate_pairs(
        vectors, threshold, dim, n_bands, band_bits, seed,
        id_col, vec_col, bucket_cap, n_vectors_hint,
    )
    return scored.filter(F.col("cosine") >= threshold), overflow


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
