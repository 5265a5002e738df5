"""One-shot curation funnel report: what the full pipeline would keep.

Runs the complete training-data funnel over a documents table and
prints ONE JSON object with a row per stage — pages in, hygiene-gate
survivors, dedup clusters and representative keeps, per-language mix
retention at the requested temperature, and the final packed-sequence
counts. The operational "what did curation cost me" question, answered
before committing a full production run.

Usage:
    python tools/curation_report.py [sf_dir] [alpha] [budget] [n_shards]

Defaults: /root/testdata/sf0.01, alpha=0.5, budget=256, n_shards=8.
All stages are the production operators (DedupPipeline + sampling +
packing); nothing here is report-only math.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from gnames_spark.config import DedupConfig
    from gnames_spark.operators.packing import pack_sequences, pack_stats
    from gnames_spark.operators.sampling import temperature_mix
    from gnames_spark.pipeline import DedupPipeline
    from gnames_spark.session import get_spark

    spark = get_spark(app_name="curation_report", master="local[8]",
                      shuffle_partitions=16)
    pages = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "text", "lang",
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        )
    )
    n_pages = pages.count()

    pipe = DedupPipeline(spark, DedupConfig(shuffle_partitions=16))
    res = pipe.run(pages)
    reps = res["representatives"]
    n_clusters = res["cluster_summary"].count()
    kept = reps.filter(F.col("is_representative")).select("doc_id")
    n_kept = kept.count()

    train = pages.join(kept, "doc_id").select("doc_id", "lang", "text")
    mixed = temperature_mix(train, "lang", alpha, salt="report")
    by_lang = {
        r["lang"]: r["n"]
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_mixed = sum(by_lang.values())

    layout = pack_sequences(mixed, budget, n_shards, salt="report")
    stats = pack_stats(layout, budget).collect()

    print(json.dumps({
        "sf_dir": sf_dir,
        "alpha": alpha, "budget": budget, "n_shards": n_shards,
        "pages_in": n_pages,
        "dup_clusters": n_clusters,
        "representatives_kept": n_kept,
        "dedup_ratio": round(1 - n_kept / n_pages, 4) if n_pages else None,
        "mixed_kept": n_mixed,
        "mix_retention": round(n_mixed / n_kept, 4) if n_kept else None,
        "mixed_by_lang": by_lang,
        "total_tokens": sum(r["total_tokens"] for r in stats),
        "training_sequences": sum(r["n_seqs"] for r in stats),
        "per_shard": {
            str(r["shard"]): {
                "docs": r["n_docs"], "tokens": r["total_tokens"],
                "seqs": r["n_seqs"], "fill": r["fill_frac"],
            }
            for r in sorted(stats, key=lambda r: r["shard"])
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
