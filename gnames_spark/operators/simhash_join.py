"""SimHash Hamming-ball candidate join via pigeonhole chunking.

The reference has no theta/range join anywhere (SURVEY §2.3 J9); this
is the one theta-like join the dedup target needs, implemented as an
equi-join: split the 64-bit fingerprint into d+1 chunks — any pair
within Hamming distance d must agree exactly on at least one chunk
(pigeonhole) — equi-join on (chunk_id, chunk_val), then the exact
popcount filter ``bit_count(a.simhash XOR b.simhash) <= d``. No
nested-loop join at any scale; everything is JVM-side.

Skew note: boilerplate families make some chunk values extremely hot
(thousands of docs agreeing on 16 bits). The same cap-and-log policy as
LSH buckets applies (reference hot-key truncation analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnames_spark.config import DedupConfig


def simhash_chunks(simhashes: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) → (doc_id, simhash, chunk_id, chunk_val)."""
    n_chunks = cfg.hamming_d + 1
    width = cfg.simhash_bits // n_chunks
    mask = (1 << width) - 1
    chunks_expr = (
        f"transform(sequence(0, {n_chunks - 1}), "
        f"c -> shiftrightunsigned(simhash, c * {width}) & {mask}L)"
    )
    return simhashes.select(
        id_col, "simhash", F.posexplode(F.expr(chunks_expr)).alias("chunk_id", "chunk_val")
    )


def simhash_candidates(
    simhashes: DataFrame, cfg: DedupConfig, id_col: str = "doc_id", dedup: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, simhash) → (pairs with hamming <= d, overflow stats).

    Pairs arrive pre-verified: the popcount filter is exact, so the
    `hamming` column is final (no later join-back needed).
    ``dedup=False`` skips the cross-chunk dropDuplicates shuffle (the
    pipeline's candidate union dedups all branches in one groupBy).
    """
    chunks = simhash_chunks(simhashes, cfg, id_col)
    counts = chunks.groupBy("chunk_id", "chunk_val").agg(F.count("*").alias("n_docs"))
    overflow = counts.filter(F.col("n_docs") > cfg.bucket_cap)
    kept = chunks.join(
        overflow.select("chunk_id", "chunk_val"), ["chunk_id", "chunk_val"], "left_anti"
    ).repartition(cfg.shuffle_partitions, "chunk_id", "chunk_val")

    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, ["chunk_id", "chunk_val"], "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(
            F.expr(f"bit_count(a.simhash ^ b.simhash) <= {cfg.hamming_d}")
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
    )
    if dedup:
        pairs = pairs.dropDuplicates(["doc_a", "doc_b"])
    return pairs.withColumn("method", F.lit("simhash")), overflow
