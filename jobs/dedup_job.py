"""Thin spark-submit driver: everything lives in gnames_spark.cli.

    spark-submit --py-files dist/gnames_spark.zip jobs/dedup_job.py \
        --input <pages.parquet> --output <out_dir> [flags...]

Kept import-light on purpose: at submit time this file is the only code
shipped outside the --py-files zip, so the package must be importable
FROM the zip (tests/test_submit.py proves that end-to-end).
"""

from gnames_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
