"""Streaming bottom-k quantile sketch — the incremental dual of
``operators/qsketch.py bottomk_sample``.

The batch sample is the k smallest char-fold key hashes; bottom-k is
MERGEABLE (bottom-k of a union == bottom-k of the per-part bottom-k's),
so the stream keeps one bounded bottom-k list per hash SHARD in keyed
state and emits its shard's full current sample as a snapshot each
trigger, tagged with a monotone ``seq``.  The latest view (max seq per
shard, then global bottom-k across shards) equals the batch sample for
ANY micro-batch split of any arrival order — selection is a pure function
of the data, the split-invariance the LSH/dedup fronts also guarantee.
Sharding bounds per-key state (k ids per shard) and spreads the state
store; the consumer-side merge touches shards × k rows, never the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from simsearch_spark.functions.text import char_fold_hash

SKETCH_SCHEMA = "shard int, seq long, h long, key string, val double"
STATE_SCHEMA = "hs array<long>, ks array<string>, vs array<double>, seq long"


def bottomk_sample_stream(
    df: DataFrame, key_col: str, val_col: str, k: int, shards: int = 8
) -> DataFrame:
    """Streamed (shard, seq, h, key, val) snapshots of each shard's
    current bottom-``k``.  Latest view ∪ shards → global bottom-k == the
    batch ``bottomk_sample`` on the rows seen so far."""
    key = F.col(key_col).cast("string")
    v = F.col(val_col).cast("double")
    rows = (
        df.where(F.col(key_col).isNotNull() & v.isNotNull() & ~F.isnan(v))
        .select(char_fold_hash(key).alias("h"), key.alias("key"), v.alias("val"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(int(shards))).cast("int"))
    )

    def emit(state_key, pdfs, state):
        import pandas as pd

        if state.exists:
            hs, ks, vs, seq = state.get
            members = sorted(zip(hs, ks, vs))
        else:
            members, seq = [], 0
        for pdf in pdfs:
            for h, kk, vv in zip(pdf["h"], pdf["key"], pdf["val"]):
                members.append((int(h), str(kk), float(vv)))
        # Dedup (h, key) repeats keeping the MINIMUM value — a pure
        # function of the data, invariant to arrival order (ADVICE r10:
        # last-arrival kept before, which broke determinism on duplicate
        # keys; the batch side's (_h, _k, _v) ordering picks the same
        # min-value row first).  Sampling keys are contractually unique
        # per row (operators/qsketch.py), so on healthy inputs this is
        # exact-repeat dedup only.
        best: dict[tuple[int, str], float] = {}
        for h, kk, vv in members:
            cur = best.get((h, kk))
            if cur is None or vv < cur:
                best[(h, kk)] = vv
        members = sorted((h, kk, vv) for (h, kk), vv in best.items())[: int(k)]
        seq = int(seq) + 1
        state.update((
            [m[0] for m in members],
            [m[1] for m in members],
            [m[2] for m in members],
            seq,
        ))
        return iter(
            [
                pd.DataFrame(
                    {
                        "shard": [int(state_key[0])] * len(members),
                        "seq": [seq] * len(members),
                        "h": [m[0] for m in members],
                        "key": [m[1] for m in members],
                        "val": [m[2] for m in members],
                    }
                )
            ]
        )

    return rows.groupBy("shard").applyInPandasWithState(
        emit, SKETCH_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
