"""Segmented (skew-guarded) sessionization — the two-phase dual of the
window-function sessionize in queries/pipeline.py.

The plain batch sessionize partitions its window by ``user_id``: one
power-law user at corpus scale means one straggler task holding that
user's entire event history (window functions have no partial
aggregation, so AQE cannot split the partition).  The segmented form
bounds per-task work by (user, time segment) instead:

- Phase 1: sessionize WITHIN ``(user_id, tus div seg_us)`` partitions —
  the same integer-µs lag/gap contract (FIXTURES.md §F5), but the heaviest
  task now holds one user-segment (a day by default), not one user-lifetime.
  Output is one summary row per non-empty segment: (n_sessions, n_events,
  first_tus, last_tus).
- Phase 2: merge sessions that span a segment boundary — one window over
  the per-SEGMENT summary rows (thousands of times smaller than the event
  stream; sorted by segment, so consecutive rows are consecutive non-empty
  segments).  A boundary merges iff the first event of a segment is within
  the gap of the previous non-empty segment's last event; each merge joins
  exactly two phase-1 sessions, so ``n_sessions = Σ segment sessions −
  Σ merges`` — exact, including sessions spanning 3+ segments (each
  boundary contributes one merge).

Result is row-identical to the single-window sessionize for any positive
timestamps and any ``seg_us > 0`` (equality-tested, including seg widths
close to and below the gap).  Cited shape: gap sessionization itself is
engine-extension territory (the reference has no event analytics); the
segmentation is the standard shuffle-skew mitigation for order-dependent
windows, where salting by value is impossible because session continuity
crosses salt boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: default segment width: one day of microseconds
DAY_US = 86_400_000_000


def sessionize_segmented(
    events: DataFrame,
    gap_us: int,
    seg_us: int = DAY_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Per-user session counts with a skew-bounded two-phase plan.

    Requires non-negative event times (``div`` truncates toward zero; the
    fixture epoch-µs values are positive).  Returns
    (user_id, n_sessions, n_events) — the same shape and values as the
    single-window batch sessionize.  Rows with a NULL event time or NULL
    user key are excluded (the uniform event-time-operator contract — they
    cannot be ordered into a session).
    """
    events = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    )
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("tus"),
        F.col(event_id_col).alias("eid"),
    ).withColumn("seg", F.expr(f"tus div {int(seg_us)}"))

    w1 = Window.partitionBy("user_id", "seg").orderBy("tus", "eid")
    flagged = e.withColumn("prev", F.lag("tus").over(w1)).withColumn(
        "new_s",
        F.when(F.col("prev").isNull() | (F.col("tus") - F.col("prev") > int(gap_us)), 1).otherwise(0),
    )
    seg_sum = flagged.groupBy("user_id", "seg").agg(
        F.sum("new_s").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("tus").alias("first_tus"),
        F.max("tus").alias("last_tus"),
    )

    w2 = Window.partitionBy("user_id").orderBy("seg")
    merged = seg_sum.withColumn("prev_last", F.lag("last_tus").over(w2)).withColumn(
        "merge",
        F.when(
            F.col("prev_last").isNotNull()
            & (F.col("first_tus") - F.col("prev_last") <= int(gap_us)),
            1,
        ).otherwise(0),
    )
    return merged.groupBy("user_id").agg(
        (F.sum("n_sessions") - F.sum("merge")).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
