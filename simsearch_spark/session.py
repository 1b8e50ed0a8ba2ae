"""SparkSession factory tuned for the similarity workload.

Local testing runs on ``local[N]``; the configs below are the ones that
matter at cluster scale too (AQE for runtime re-planning and skew joins,
Arrow for the few Pandas-UDF paths, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "simsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.  ``spark.sql.shuffle.partitions``
    is only a floor — AQE coalesces small shuffle partitions at runtime, so
    over-provisioning here is safe at 100 TB while staying cheap at sf0.01.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switching — all essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus) * 2))
        # Arrow for the (rare) pandas-UDF paths: vectorized batch transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the events fixture stores TIMESTAMP(NANOS) which vanilla Spark
        # rejects; read as long nanos, converted in sources.registry
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # hash-range-partitioned mount artifacts (dedup_shingles at 256
        # dirs, pq_codes at cell fan-out) cross the default threshold of
        # 32, which makes every relation resolution launch a CLUSTER JOB
        # just to list directories (~0.45 s of the dedup_append floor);
        # driver-side listing of a few thousand dirs is milliseconds on
        # local fs and a bounded batched call on object stores
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def run_with_timeout(spark: SparkSession, thunk, timeout_s: float, group: str = "simsearch-query"):
    """T9 query timeout (``Constants.java:51`` RANKING_MAX_TIME; loop guards
    in every ranking class): cancel the job group when the budget elapses.

    Divergence from the reference, by contract: the reference returns an
    *approximate* best-so-far list on timeout (T8); Spark jobs are
    all-or-nothing, so timeout raises and the caller retries/loosens.  The
    exactness contract (FIXTURES.md §F4) is unaffected.
    """
    import threading

    sc = spark.sparkContext
    sc.setJobGroup(group, "simsearch query with timeout", interruptOnCancel=True)
    timer = threading.Timer(timeout_s, lambda: sc.cancelJobGroup(group))
    timer.start()
    try:
        return thunk()
    finally:
        timer.cancel()
        sc.setJobGroup(None, None)
