"""Spark-vs-DuckDB oracle parity for every query EXCLUDED from the driver's
50-row verification window (queries/__init__.py DRIVER_EXCLUDED).

The external harness only verifies the driver surface; these queries trade
their external verdict for this in-repo gate, which runs the exact same
comparison (row count + column names + order-insensitive normalized values)
at sf0.001 on every pytest run.  If a query is added to DRIVER_EXCLUDED
without an oracle, this file fails loudly rather than letting the exclusion
become a verification hole.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from simsearch_spark.queries import DRIVER_EXCLUDED, REGISTRY
from simsearch_spark.sources.registry import TESTDATA_TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


# pytest-equality elsewhere, no standalone oracle needed (see DRIVER_EXCLUDED)
_EQUIVALENCE_COVERED = {
    "events_sessionize_segmented",
    "bpe_merges",
    "bpe_token_stats",
    # row-identical to bpe_token_stats (deterministic training, shared
    # encode kernel) — tests/test_bpe.py::test_encode_mounted_equals_selfcontained
    "bpe_encode_mounted",
}


def test_every_exclusion_is_covered():
    """No silent verification holes: every driver-excluded query must carry
    either an oracle (checked below) or a named equivalence test."""
    for name in DRIVER_EXCLUDED:
        _fn, sql = REGISTRY[name]
        assert sql is not None or name in _EQUIVALENCE_COVERED, name


# Driver hasher is type-sensitive: DuckDB sum(int)→HUGEINT vs Spark BIGINT
# hash-mismatches even when every value compares equal (the r2/r3/r5 red rows).
# The fetchall() comparisons below erase that difference, so guard the TYPES
# of every oracle in the registry — driver surface included — here.
_UNSPARKABLE = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.parametrize(
    "name", sorted(n for n, (_f, s) in REGISTRY.items() if s is not None)
)
def test_oracle_output_types_sparkable(duck, name):
    rel = duck.sql(REGISTRY[name][1])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(_UNSPARKABLE)
    ]
    assert not offenders, (
        f"{name}: oracle columns {offenders} would hash-mismatch at the driver "
        f"(type-sensitive hasher); add ::BIGINT/::DOUBLE casts in the SQL"
    )


@pytest.mark.parametrize(
    "name", sorted(n for n in DRIVER_EXCLUDED if REGISTRY[n][1] is not None)
)
def test_excluded_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    s_cols, s_rows = _norm([c.lower() for c in sdf.columns], [tuple(r) for r in sdf.collect()])
    res = duck.execute(sql)
    o_cols, o_rows = _norm(
        [d[0].lower() for d in res.description], res.fetchall()
    )
    assert s_cols == o_cols
    assert len(s_rows) == len(o_rows)
    assert s_rows == o_rows
