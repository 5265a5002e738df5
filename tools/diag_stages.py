"""Quick per-stage timing diagnosis at a small corpus size.

Usage: python tools/diag_stages.py [n_docs] [winnow_window] [route_overflow]
Prints stage timings + candidate-pair counts by method.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
sys.path.insert(0, ".")

import time

from pyspark.sql import functions as F

from gnames_spark.config import DedupConfig
from gnames_spark.corpus import generate_pages
from gnames_spark.pipeline import DedupPipeline
from gnames_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="diag")
    cfg = DedupConfig(shuffle_partitions=32, winnow_window=w,
                      min_substring_len=max(512, DedupConfig(winnow_window=w).substring_guarantee_chars()))
    pages = generate_pages(spark, n, seed=42, partitions=32).drop("html")
    pages.cache().count()
    t0 = time.monotonic()
    pipe = DedupPipeline(spark, cfg)
    res = pipe.run(pages)
    res["components"].count()
    total = time.monotonic() - t0
    print(f"TOTAL {total:.1f}s  n={n} w={w}")
    for m in pipe.metrics.stages:
        print(f"  {m.stage:28s} rows={m.rows:>9} secs={m.secs:7.1f} extra={getattr(m, 'extra', '')}")
    cands = res["candidate_pairs"]
    cands.groupBy("method").agg(F.count("*").alias("n"),
                                F.sum(F.col("anchor_overflow").cast("int")).alias("n_ov")).show()
    ver = res["verified_pairs"]
    ver.groupBy("method", "passed").count().show()


main()
