"""Simulate the external driver's environment: import __spark_entry__ the way
the harness does, build a BARE SparkSession (none of session.py's configs —
default shuffle partitions, no nanos conf, whatever zone the host has), and
run every driver-surface query at sf0.01.

This catches dependencies on the repo's own session construction that the
oracle gate (which uses get_spark) cannot see — the class of failure that
cost round 1 (nanosAsLong) and round 4 (NTZ events encoding).

Usage: python tools/driver_sim.py [query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    entry_rows = mod.entry(spark).collect()
    print(f"entry: {len(entry_rows)} rows")
    if not entry_rows:
        print("FAIL: entry returned no rows")
        return 1

    only = set(sys.argv[1:])
    qs, oracles = mod.queries(), mod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            n = len(fn(spark, SF_DIR).collect())
            print(f"{name:28s} {n} rows" + ("" if name in oracles else "  (rows-only)"))
        except Exception:
            fails.append(name)
            traceback.print_exc()
    print(f"\nsurface: {len(qs)} queries, oracles: {len(oracles)}")
    if fails:
        print(f"FAILURES: {fails}")
        return 1
    print("driver simulation clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
