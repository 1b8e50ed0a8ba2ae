"""Stateful streaming deduplication — the custom-operator tier of the
streaming surface (`applyInPandasWithState`), complementing the built-in
window/session operators in streaming/events.py.

Semantics (snapshot emission): per normalized-document fingerprint, EVERY
micro-batch that contains the fingerprint emits one snapshot row carrying
the running totals over all batches seen so far — ``keeper`` = min id seen,
``n_docs`` = total occurrences seen.  Both are monotone (keeper
non-increasing, n_docs increasing), so the LATEST snapshot per fingerprint
equals the batch ``exact_dedup_groups`` result no matter how the input was
split into micro-batches; ``latest_snapshots`` reduces an append-mode sink
to that final view.  This closes the r2-r4 multi-batch divergence: the old
first-wins contract emitted keeper/n_docs from the first batch only, which
silently diverged from the batch oracle whenever a fingerprint straddled a
batch boundary.

Scale: state is one small (keeper, n) tuple per DISTINCT fingerprint,
partitioned by fingerprint across executors (RocksDB/HDFS state store on a
cluster); the per-batch work is a key-partitioned shuffle of
(fingerprint, id) pairs — the same single-shuffle shape as the batch dedup.
Emission volume per batch = fingerprints touched by that batch, not total
state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from simsearch_spark.functions.text import doc_fingerprint

OUTPUT_SCHEMA = "fingerprint long, keeper long, n_docs long"
STATE_SCHEMA = "keeper long, n long"


def dedup_docs_stream(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Running-totals fingerprint dedup over a streaming DataFrame of
    documents: each batch emits the group's cumulative (keeper, n_docs)."""
    fp = docs.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))

    def snapshot(key, pdfs, state):
        import warnings

        import pandas as pd

        # same worker-process pandas FutureWarning suppression as
        # streaming/asof.py — the state serializer's concat, not our frames
        warnings.filterwarnings(
            "ignore", category=FutureWarning, message=".*concatenation with empty or all-NA.*"
        )

        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        if state.exists:
            keeper, n = state.get
            keeper, n = min(keeper, min(ids)), n + len(ids)
        else:
            keeper, n = min(ids), len(ids)
        state.update((keeper, n))
        return iter(
            [pd.DataFrame({"fingerprint": [key[0]], "keeper": [keeper], "n_docs": [n]})]
        )

    return fp.groupBy("fingerprint").applyInPandasWithState(
        snapshot, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def latest_snapshots(sink: DataFrame) -> DataFrame:
    """Reduce an append-mode snapshot sink to the final per-fingerprint view
    (= the batch exact-dedup result).  keeper is monotone non-increasing and
    n_docs monotone increasing across a group's snapshots, so min/max pick
    the last one without needing a batch-ordinal column."""
    return sink.groupBy("fingerprint").agg(
        F.min("keeper").alias("keeper"), F.max("n_docs").alias("n_docs")
    )
