"""Declared queries: Structured Streaming pipelines replayed to completion
on the bounded events fixture and compared against *batch* DuckDB oracles —
the strongest available check that watermarked windowed aggregation and
session windows implement exactly the batch semantics.

The callable stages the fixture into a temp directory (file-source streams
need directories), drives the stream with availableNow to a memory sink, and
returns the materialized table.  Oracles are the same SQL as the batch event
analytics (queries/pipeline.py).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.queries.pipeline import SQL_EVENTS_HOURLY, SQL_EVENTS_SESSIONIZE
from simsearch_spark.sources.registry import ensure_nanos_conf
from simsearch_spark.sources.registry import load_table
from simsearch_spark.streaming.events import (
    enrich_rollup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)


def _staged_table(sf_dir: str, name: str) -> str:
    d = tempfile.mkdtemp(prefix=f"simsearch_stream_{name}_")
    shutil.copy(f"{sf_dir}/{name}.parquet", f"{d}/part-0.parquet")
    return d


def _unique(name: str) -> str:
    """Memory-sink table names are session-global; a reused harness session
    that invokes a query twice (schema probe + collect) would collide on a
    fixed name.  A per-invocation suffix makes every run independent."""
    return f"{name}_{uuid.uuid4().hex[:12]}"


def _run_staged(spark: SparkSession, staged: str, build, sink: str, mode: str):
    """Run one bounded replay over a staged directory, always cleaning the
    staging dir up (the memory sink owns the results after termination)."""
    try:
        q = run_stream_to_memory(build(), sink, mode=mode)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return q


def q_stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running-
    totals fingerprint dedup replayed on the bounded documents fixture.  Each
    micro-batch emits per-touched-fingerprint snapshots of the cumulative
    (keeper = min id, n_docs = total); ``latest_snapshots`` reduces the
    append-mode sink to the final view, which equals the batch exact-dedup
    oracle (SQL_DEDUP_EXACT) for ANY micro-batch split of the input — the
    replay no longer depends on availableNow delivering a single batch."""
    from simsearch_spark.streaming.dedup import dedup_docs_stream, latest_snapshots

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    staged = _staged_table(sf_dir, "documents")
    stream = spark.readStream.format("parquet").schema(schema).load(staged)
    sink = _unique("q_stream_dedup")
    _run_staged(spark, staged, lambda: dedup_docs_stream(stream), sink, "append")
    return latest_snapshots(spark.table(sink))


def q_stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_nanos_conf(spark)  # harness sessions lack the nanos conf; ts arrives bigint
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    staged = _staged_table(sf_dir, "events")
    stream = read_events_stream(spark, staged, schema=schema)
    # complete mode: append would withhold windows the final watermark has not
    # passed on a bounded replay (they would sit in state forever)
    sink = _unique("q_stream_hourly")
    _run_staged(spark, staged, lambda: hourly_rollup_stream(stream), sink, "complete")
    return spark.table(sink)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    staged = _staged_table(sf_dir, "events")
    stream = read_events_stream(spark, staged, schema=schema)
    sink = _unique("q_stream_sessions")
    _run_staged(spark, staged, lambda: sessionize_stream(stream), sink, "complete")
    # roll session windows up to the per-user shape of the batch oracle
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )


def _staged_time_slices(sf_dir: str, name: str, n_slices: int = 3) -> str:
    """Stage one fixture into ``n_slices`` event-time-ordered parquet files
    (global sort by (ts, event_id), sliced by row range, ascending mtimes so
    the file source replays them as in-order micro-batches) — the bounded
    stand-in for a per-key-ordered stream."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix=f"simsearch_stream_{name}_sliced_")
    t = pq.read_table(f"{sf_dir}/{name}.parquet")
    # Sort on the µs-floored key the as-of operator and its oracle order by
    # ((epoch_us, event_id)), NOT raw ts: under a TIMESTAMP(NANOS) fixture a
    # raw-ts sort can break same-microsecond ties by their ns remainder,
    # splitting a tied pair across a slice boundary in an order the
    # operator's documented (µs, event_id) contract never sees.
    epoch = pc.cast(t["ts"], pa.int64())
    if getattr(t.schema.field("ts").type, "unit", "us") == "ns":
        epoch = pc.divide(epoch, 1000)
    t = t.append_column("__epoch_us", epoch)
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("__epoch_us", "ascending"), ("event_id", "ascending")]
        )
    ).drop_columns(["__epoch_us"])
    step = -(-t.num_rows // n_slices)
    now = time.time()
    for i in range(n_slices):
        part = t.slice(i * step, step)
        if part.num_rows == 0:
            break
        path = f"{d}/b{i}.parquet"
        pq.write_table(part, path)
        os.utime(path, (now + i, now + i))
    return d


def q_stream_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user as-of click attribution
    (streaming/asof.py) replayed over time-ordered micro-batch slices and
    compared against the BATCH as-of oracle — state (latest click per user)
    must carry correctly across batch boundaries for the outputs to match."""
    from simsearch_spark.streaming.asof import asof_click_stream

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    staged = _staged_time_slices(sf_dir, "events", n_slices=3)
    stream = read_events_stream(
        spark, staged, schema=schema, max_files_per_trigger=1
    )
    sink = _unique("q_stream_asof")
    _run_staged(spark, staged, lambda: asof_click_stream(stream), sink, "append")
    return spark.table(sink)


def q_stream_enrich_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with the (static,
    broadcast-sized) customer dimension, rolled up per (hour, market
    segment).  Replayed bounded and compared against the batch join+agg
    oracle — verifying the per-micro-batch dimension hash-join produces
    exactly the batch join's rows."""
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    staged = _staged_table(sf_dir, "events")
    stream = read_events_stream(spark, staged, schema=schema)
    dim = load_table(spark, sf_dir, "customer")
    sink = _unique("q_stream_enrich")
    _run_staged(spark, staged, lambda: enrich_rollup_stream(stream, dim), sink, "complete")
    return spark.table(sink)


SQL_STREAM_ENRICH_HOURLY = """
SELECT date_trunc('hour', e.ts) AS hour, c.c_mktsegment AS segment,
       count(*) AS n, round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.ts IS NOT NULL
GROUP BY 1, 2
"""


def _sql_events_hourly_nonnull_ts() -> str:
    """The streaming dual of the events-hourly oracle: identical SQL with
    NULL event times excluded (no window is assignable under a watermark).
    Derived from the batch constant by substitution, but GUARDED — if
    SQL_EVENTS_HOURLY ever gains a second ``FROM events`` (subquery, join),
    a blind ``.replace`` would rewrite both and silently corrupt the
    oracle, so the single-occurrence invariant is asserted first."""
    occurrences = SQL_EVENTS_HOURLY.count("FROM events")
    if occurrences != 1:
        raise AssertionError(
            "SQL_EVENTS_HOURLY now contains %d 'FROM events' clauses; "
            "the streaming oracle substitution assumes exactly one — "
            "give stream_events_hourly its own dedicated SQL constant"
            % occurrences
        )
    return SQL_EVENTS_HOURLY.replace(
        "FROM events", "FROM events WHERE ts IS NOT NULL"
    )


def _sql_dedup_exact() -> str:
    from simsearch_spark.queries.pipeline import SQL_DEDUP_EXACT

    return SQL_DEDUP_EXACT


def _sql_events_asof() -> str:
    from simsearch_spark.queries.pipeline import SQL_EVENTS_ASOF_CLICK

    return SQL_EVENTS_ASOF_CLICK


STREAMING_QUERIES = {
    # streaming duals drop NULL-event-time rows (no window assignable under
    # a watermark); their oracles must too — the BATCH events_hourly keeps
    # its NULL-hour group consistently in both engines, so only the
    # streaming oracle is wrapped
    "stream_events_hourly": (
        q_stream_events_hourly,
        _sql_events_hourly_nonnull_ts(),
    ),
    "stream_sessionize": (q_stream_sessionize, SQL_EVENTS_SESSIONIZE),
    "stream_dedup_docs": (q_stream_dedup_docs, _sql_dedup_exact()),
    "stream_enrich_hourly": (q_stream_enrich_hourly, SQL_STREAM_ENRICH_HOURLY),
    "stream_asof_click": (q_stream_asof_click, _sql_events_asof()),
}
