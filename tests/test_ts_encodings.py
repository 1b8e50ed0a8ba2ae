"""Cross-encoding invariance for the events fixture (FIXTURES.md §F5).

The driver has regenerated ``events.parquet`` with a different physical
``ts`` encoding twice already (r2 TIMESTAMP(NANOS), r4 µs-NTZ); each switch
initially broke timestamp-sensitive queries.  ``sources/registry.py``
normalizes all three observed encodings to the canonical session-TZ µs
TIMESTAMP — this test pins that contract by REWRITING the live fixture into
every encoding and asserting the timestamp-sensitive declared queries return
row-identical results on each, so the next regeneration fails here instead
of in the driver's correctness gate.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simsearch_spark.queries import REGISTRY

ENCODINGS = {
    "ns": pa.timestamp("ns"),
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}

BATCH_QUERIES = [
    "events_sessionize",  # window over µs-floored ts
    "events_asof_click",  # (epoch_us, event_id) ordering / tie-break
    "events_range_join",  # bucketed range predicate on ts
    "events_rollup_multi",  # hour/day truncation
]
STREAM_QUERIES = [
    "stream_sessionize",  # availableNow replay of the sessionize window
    "stream_asof_click",  # staged time slices sorted by (epoch_us, event_id)
]


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory):
    """One fixture dir per encoding: events.parquet re-encoded, every other
    table symlinked from the live fixture dir."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    dirs = {}
    for name, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{name}")
        for f in os.listdir(sf_dir):
            if f.endswith(".parquet") and f != "events.parquet":
                os.symlink(os.path.join(sf_dir, f), d / f)
        idx = src.column_names.index("ts")
        # safe=False: ns→µs truncation is the same floor the engine applies
        recast = src.set_column(
            idx, "ts", src.column("ts").cast(ts_type, safe=False)
        )
        pq.write_table(recast, d / "events.parquet", version="2.6")
        dirs[name] = str(d)
    return dirs


def _rows(spark, qname: str, path: str) -> list[str]:
    fn = REGISTRY[qname][0]
    return sorted(repr(r) for r in fn(spark, path).collect())


@pytest.mark.parametrize("qname", BATCH_QUERIES)
def test_batch_queries_encoding_invariant(spark, encoded_dirs, qname):
    baseline = _rows(spark, qname, encoded_dirs["us_ntz"])
    assert len(baseline) > 0
    for enc in ("ns", "us_utc"):
        assert _rows(spark, qname, encoded_dirs[enc]) == baseline, (
            f"{qname} diverges under the {enc} ts encoding"
        )


@pytest.mark.parametrize("qname", STREAM_QUERIES)
def test_stream_queries_encoding_invariant(spark, encoded_dirs, qname):
    """ns is the risky encoding for streaming: the staged-slice sort key and
    per-batch state ordering must floor to µs BEFORE slicing (a raw-ns sort
    could order same-µs ties differently than the operator's contract)."""
    baseline = _rows(spark, qname, encoded_dirs["us_ntz"])
    assert len(baseline) > 0
    assert _rows(spark, qname, encoded_dirs["ns"]) == baseline, (
        f"{qname} diverges under the ns ts encoding"
    )


def test_encoded_fixtures_have_expected_physical_types(encoded_dirs):
    for name, ts_type in ENCODINGS.items():
        schema = pq.read_schema(os.path.join(encoded_dirs[name], "events.parquet"))
        assert schema.field("ts").type == ts_type
