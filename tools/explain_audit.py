"""Print formatted physical plans for the headline queries and flag
scale smells (missing pushdown, row-Python, missing broadcast).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from gnames_spark.plans.audit import (  # noqa: E402
    formatted_plan,
    has_python_row_udf,
    read_schema_columns,
)

DEFAULT = ["dedup_minhash_lsh", "q1_pricing_summary", "j1_multiway_join", "emb_topk"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as entry
    from gnames_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=8)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        print(f"\n=== {name} " + "=" * 50)
        print(formatted_plan(df))
        smells = []
        if has_python_row_udf(df):
            smells.append("ROW-PYTHON UDF (BatchEvalPython) in plan")
        scans = read_schema_columns(df)
        wide = [cols for cols in scans if len(cols) > 8]
        if wide:
            smells.append(f"wide scan reading {len(wide[0])} columns")
        print("SMELLS:", smells or "none")
    spark.stop()


if __name__ == "__main__":
    main()
