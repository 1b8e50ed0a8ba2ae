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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.queries.pipeline import SQL_EVENTS_HOURLY, SQL_EVENTS_SESSIONIZE
from simsearch_spark.sources.registry import ensure_nanos_conf
from simsearch_spark.streaming.events import (
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)


def _staged_events(spark: SparkSession, sf_dir: str) -> str:
    d = tempfile.mkdtemp(prefix="simsearch_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    return d


def _staged_table(sf_dir: str, name: str) -> str:
    d = tempfile.mkdtemp(prefix=f"simsearch_stream_{name}_")
    shutil.copy(f"{sf_dir}/{name}.parquet", f"{d}/part-0.parquet")
    return d


def q_stream_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): first-seen
    fingerprint dedup replayed on the bounded documents fixture — a single
    availableNow batch, so the output equals the batch exact-dedup oracle
    row-for-row (SQL_DEDUP_EXACT)."""
    from simsearch_spark.queries.pipeline import SQL_DEDUP_EXACT  # noqa: F401 (oracle)
    from simsearch_spark.streaming.dedup import dedup_docs_stream

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.format("parquet").schema(schema).load(_staged_table(sf_dir, "documents"))
    )
    q = run_stream_to_memory(dedup_docs_stream(stream), "q_stream_dedup", mode="append")
    q.stop()
    return spark.table("q_stream_dedup")


def q_stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_nanos_conf(spark)  # harness sessions lack the nanos conf; ts arrives bigint
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = read_events_stream(spark, _staged_events(spark, sf_dir), schema=schema)
    # complete mode: append would withhold windows the final watermark has not
    # passed on a bounded replay (they would sit in state forever)
    q = run_stream_to_memory(hourly_rollup_stream(stream), "q_stream_hourly", mode="complete")
    q.stop()
    return spark.table("q_stream_hourly")


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = read_events_stream(spark, _staged_events(spark, sf_dir), schema=schema)
    q = run_stream_to_memory(sessionize_stream(stream), "q_stream_sessions", mode="complete")
    q.stop()
    # roll session windows up to the per-user shape of the batch oracle
    return (
        spark.table("q_stream_sessions")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )


def _sql_dedup_exact() -> str:
    from simsearch_spark.queries.pipeline import SQL_DEDUP_EXACT

    return SQL_DEDUP_EXACT


STREAMING_QUERIES = {
    "stream_events_hourly": (q_stream_events_hourly, SQL_EVENTS_HOURLY),
    "stream_sessionize": (q_stream_sessionize, SQL_EVENTS_SESSIONIZE),
    "stream_dedup_docs": (q_stream_dedup_docs, _sql_dedup_exact()),
}
