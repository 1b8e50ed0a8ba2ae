"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.7: its "progressive"
queues are intra-query threading, not stream semantics), so these are
engine extensions: the streaming duals of the batch event analytics in
queries/pipeline.py, built the idiomatic way — readStream → event-time
watermark → windowed/stateful aggregation → writeStream.

Scale notes: tumbling-window aggregation is a streaming shuffle keyed by
(window, event_type) with partial aggregation before the exchange; the
watermark bounds state.  Session windows use Spark's native
``session_window`` (gap-based state merge) — the same 30-min gap semantics
as the batch sessionize query, which doubles as its correctness oracle on a
replayed bounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.sources.registry import normalize_events_ts

SESSION_GAP = "30 minutes"
WATERMARK = "2 hours"


def read_events_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over parquet event files (one file per
    micro-batch when replaying fixtures in tests).  In production this is
    Kafka/Kinesis — only this reader changes; the graph below is
    source-agnostic.  ``max_files_per_trigger=1`` forces one staged file
    per micro-batch (ordered-replay harness for stateful operators)."""
    reader = spark.readStream.format("parquet")
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    return normalize_events_ts(df)


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Streaming tumbling-window rollup: the dual of queries/pipeline.py
    q_events_hourly.  Watermark bounds late data and lets Spark drop window
    state once `WATERMARK` behind the max observed event time."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "avg_value", "sum_value")
    )


def sessionize_stream(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Streaming gap-based sessionization via native session windows —
    the stateful dual of q_events_sessionize (same 30-min gap).  NULL user
    keys are excluded (the uniform event-time-operator contract; NULL event
    times are already unassignable under the watermark), matching the batch
    oracle's filter."""
    return (
        events.where(F.col("user_id").isNotNull())
        .withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def enrich_rollup_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment + tumbling rollup: join the event stream
    against a static dimension table, then aggregate per (hour, segment).

    The stream-static join is stateless — each micro-batch hash-joins
    against the (re-read per batch, broadcast-sized) dimension snapshot, no
    watermark interaction, no join state store; only the downstream window
    aggregation keeps state, bounded by the watermark.  At 100 TB the dim
    side is the small one (customers vs events) so Spark broadcasts it into
    every micro-batch; a growing dim becomes a slowly-changing stream-stream
    join, which is a different operator (state + time bounds on both sides).
    """
    d = dim.select(F.col("c_custkey").alias(key), F.col("c_mktsegment").alias("segment"))
    return (
        events.withWatermark("ts", WATERMARK)
        .join(d, key)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "segment", "n", "sum_value")
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    mode: str = "append",
    timeout_s: float = 300.0,
    shuffle_partitions: int = 16,
):
    """Drive a streaming graph to a memory sink until all available input is
    consumed (test/replay harness).  Returns the StreamingQuery; results land
    in the ``query_name`` in-memory table.

    Hardened for external harness sessions (the r2 driver lost the last
    streaming verdict):

    - state-store parallelism is pinned to ``shuffle_partitions`` for the
      duration of the run (saved/restored) — a host session default of 200
      creates 200 state partitions + checkpoint dirs per stateful query,
      an order-of-magnitude startup tax on a bounded replay;
    - ``awaitTermination`` is bounded: a wedged stream raises a clear
      TimeoutError (a recordable failure) instead of hanging the harness;
    - the query is stopped on every exit path.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    if prev is not None:
        shuffle_partitions = min(shuffle_partitions, int(prev))
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(
                    f"streaming query {query_name!r} still running after {timeout_s}s"
                )
        finally:
            q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return q
