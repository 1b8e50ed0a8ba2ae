"""Local stand-in for the driver's correctness gate: run every declared query
on Spark and its DuckDB oracle at sf0.01, compare row count + column names +
order-insensitive values.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from simsearch_spark.queries import REGISTRY
from simsearch_spark.session import get_spark
from simsearch_spark.sources.registry import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        if sql is None:
            print(f"{name:24s} rows-only: {len(s_rows)} rows")
            if len(s_rows) == 0:
                failures.append((name, "0 rows"))
            continue
        rel = con.sql(sql)
        # the driver's value-hash is type-sensitive: DuckDB sum(int) yields
        # HUGEINT (INT128) where Spark yields BIGINT, so values that compare
        # equal here still hash-mismatch at the driver — reject such oracles
        bad_types = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper().startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))
        ]
        if bad_types:
            failures.append((name, f"oracle column type not Spark-hashable: {bad_types}"))
            print(f"{name:24s} ORACLE TYPE {bad_types} — add ::BIGINT/::DOUBLE cast in the SQL")
            continue
        d_cols = [c.lower() for c in rel.columns]
        d_rows = rel.fetchall()
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append((name, f"schema: spark={sc} duckdb={dc}"))
            print(f"{name:24s} SCHEMA MISMATCH {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rows: spark={len(sr)} duckdb={len(dr)}"))
            print(f"{name:24s} ROWCOUNT MISMATCH {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            failures.append((name, f"values: {diffs}"))
            print(f"{name:24s} VALUE MISMATCH e.g. {diffs[:1]}")
        else:
            print(f"{name:24s} OK ({len(sr)} rows)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        for n, why in failures:
            print(f"  {n}: {why[:300]}")
        return 1
    print("\nall declared queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
