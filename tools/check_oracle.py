"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf directory, then compares row count, sorted
column names, and the order-insensitive multiset of normalized row
values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox-only shuffle scratch
import time
from datetime import datetime

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse float noise below the rounding we apply in queries
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def row_key(row: dict, cols: list[str]) -> str:
    return "|".join(normalize(row[c]) for c in cols)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from gnames_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        secs = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{secs:.1f}s]")
            if not isinstance(len(srows), int):
                failures.append(name)
            continue
        try:
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows = [dict(zip(dcols_raw, r)) for r in cur.fetchall()]
            dcols = sorted(dcols_raw)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if scols != dcols:
            problems.append(f"schema: spark={scols} duckdb={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            s_keys = sorted(row_key(r, scols) for r in srows)
            d_keys = sorted(row_key(r, scols) for r in drows)
            if s_keys != d_keys:
                diffs = [
                    (a, b) for a, b in zip(s_keys, d_keys) if a != b
                ][:3]
                problems.append(f"values: first diffs {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows match [{secs:.1f}s]")

    spark.stop()
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
