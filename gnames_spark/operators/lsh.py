"""LSH banding + bucket self-join → candidate pairs.

Reference analog: the candidate-generation join shape is exactly the
reference's 4-way posting-list equi-join
(`/root/reference/internal/io/pgio/sp_query.go:19-27`) — docs sharing a
(band, bucket_hash) key are candidates, as names sharing a word posting
are. The bucket-size cap is the reference's hot-key truncation
(>100 results → drop, `/root/reference/internal/io/pgio/match_records_map.go:17-22`):
a bucket larger than ``bucket_cap`` is dropped *and counted* — never
silently (P5 in SURVEY §4).

Scale notes:
- Band hashing is JVM-side (`slice` + `xxhash64` over the signature
  array) — no Python between the MinHash UDF and the join.
- The self-join shuffles both sides by (band, bucket_hash); we
  repartition explicitly so the shuffle width is the configured
  partition count rather than whatever upstream produced, and AQE's
  skew-join splitting handles residual imbalance below the cap.
- Emitted pairs are deduped across bands with one extra shuffle
  (`dropDuplicates`) — at 10^12 docs this is the dominant shuffle, and
  it is unavoidable: it is the set-union of per-band candidate sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnames_spark.config import DedupConfig


def band_buckets(signatures: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """Explode a minhash signature into (doc_id, band, bucket_hash).

    bucket_hash = xxhash64 of the band's r-slice of the signature;
    banding is pure Catalyst (whole-stage codegen'd).
    """
    b, r = cfg.bands, cfg.rows_per_band
    bands_expr = (
        f"transform(sequence(0, {b - 1}), i -> xxhash64(slice(minhash, i * {r} + 1, {r})))"
    )
    return (
        signatures.select(id_col, F.posexplode(F.expr(bands_expr)).alias("band", "bucket_hash"))
    )


def capped_buckets(buckets: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """Split buckets into (kept, overflow_stats).

    overflow_stats = (band, bucket_hash, n_docs) for buckets above the
    cap — persisted by the pipeline so truncation is observable, the
    way the reference logs its skipped-record counts
    (`/root/reference/internal/io/pgio/match_records_map.go:236-239`).
    """
    counts = buckets.groupBy("band", "bucket_hash").agg(F.count("*").alias("n_docs"))
    overflow = counts.filter(F.col("n_docs") > cfg.bucket_cap)
    kept = buckets.join(overflow.select("band", "bucket_hash"), ["band", "bucket_hash"], "left_anti")
    return kept, overflow


def candidate_pairs(
    buckets: DataFrame, cfg: DedupConfig, id_col: str = "doc_id", dedup: bool = True
) -> DataFrame:
    """Self-join docs sharing an LSH bucket → (doc_a < doc_b, method).

    ``dedup=False`` skips the cross-band dropDuplicates shuffle — used by
    the pipeline, whose candidate-union stage ends in a per-pair groupBy
    that dedups all branches at once (one shuffle instead of four)."""
    kept = buckets.repartition(cfg.shuffle_partitions, "band", "bucket_hash")
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(b, ["band", "bucket_hash"], "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    )
    if dedup:
        pairs = pairs.dropDuplicates(["doc_a", "doc_b"])
    return pairs.withColumn("method", F.lit("lsh"))


def lsh_candidates(
    signatures: DataFrame, cfg: DedupConfig, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """signatures (doc_id, minhash) → (candidate pairs, overflow stats)."""
    buckets = band_buckets(signatures, cfg, id_col)
    kept, overflow = capped_buckets(buckets, cfg)
    return candidate_pairs(kept, cfg, id_col), overflow
