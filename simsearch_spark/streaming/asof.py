"""Streaming as-of join (custom stateful operator #2): per-user click
attribution over an event stream via ``applyInPandasWithState``.

Each purchase is attributed to the user's most recent prior click — the
streaming dual of the batch as-of join (queries/pipeline.py
``q_events_asof_click``, an ignore-nulls running last over one key window).
State per user is a single (click_tus, click_id) tuple: the latest click
seen so far, carried across micro-batches.  Within a batch, rows are
processed in (tus, event_id) order; purchases emit exactly once, in the
batch that delivers them, so an append-mode sink accumulates the full
attribution table.

Ordering contract: results equal the batch as-of join when micro-batches
respect per-user event-time order (each user's events in batch N all precede
their events in batch N+1 in (ts, event_id) order).  That holds for
time-sliced bounded replays (the declared query stages time-ordered slices)
and for per-key-ordered sources (Kafka keyed by user).  For sources that
reorder within a bounded delay, the production extension buffers events in
state and flushes rows older than the watermark on each batch — same state
schema, same emission contract, more state.

Scale: state is one small tuple per ACTIVE user (RocksDB state store on a
cluster); each batch shuffles only that batch's (user, event) rows to their
key partition — no corpus-sized reprocessing, no join state on the purchase
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, user_id long, click_id long, delta_us long"
STATE_SCHEMA = "click_tus long, click_id long"


def asof_click_stream(events: DataFrame) -> DataFrame:
    """Attribute each purchase in the stream to the user's latest prior
    click (NULLs when none), maintaining one latest-click tuple per user."""
    # uniform event-time-operator contract (r8): NULL event times / NULL
    # user keys cannot be ordered or keyed — exclude them HERE, before the
    # state kernel, where a NULL tus would otherwise arrive as pandas NaN
    # and kill the task on int()
    ev = events.where(
        F.col("event_type").isin("click", "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id"),
        F.col("event_id"),
        F.unix_micros("ts").alias("tus"),
        F.col("event_type"),
    )

    def attribute(key, pdfs, state):
        import warnings

        import pandas as pd

        # pyspark's state serializer concatenates output frames after this
        # function returns (same worker process); all-NA nullable columns
        # (click_id with no prior click) trip a pandas FutureWarning there
        # that would spam the driver log on every batch
        warnings.filterwarnings(
            "ignore", category=FutureWarning, message=".*concatenation with empty or all-NA.*"
        )

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["tus", "event_id"], kind="mergesort"
        )
        click_tus, click_id = state.get if state.exists else (None, None)
        out_eid, out_cid, out_delta = [], [], []
        for eid, tus, etype in zip(rows["event_id"], rows["tus"], rows["event_type"]):
            if etype == "click":
                click_tus, click_id = int(tus), int(eid)
            else:
                out_eid.append(int(eid))
                out_cid.append(click_id)
                out_delta.append(None if click_tus is None else int(tus) - click_tus)
        if click_tus is not None:
            state.update((click_tus, click_id))
        if not out_eid:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    {
                        "event_id": pd.array(out_eid, dtype="Int64"),
                        "user_id": pd.array([key[0]] * len(out_eid), dtype="Int64"),
                        "click_id": pd.array(out_cid, dtype="Int64"),
                        "delta_us": pd.array(out_delta, dtype="Int64"),
                    }
                )
            ]
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        attribute, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
