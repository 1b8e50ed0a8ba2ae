"""Stateful streaming deduplication — the custom-operator tier of the
streaming surface (`applyInPandasWithState`), complementing the built-in
window/session operators in streaming/events.py.

Semantics: per normalized-document fingerprint, the FIRST micro-batch that
contains the fingerprint emits one row (keeper = min id in that batch,
n_docs = batch occurrence count) and marks the group seen; later batches
emit nothing.  On a bounded single-batch replay this is exactly the batch
`exact_dedup_groups` result, which is the correctness oracle; on a live
stream it is the standard first-wins streaming dedup contract.

Scale: state is one small tuple per DISTINCT fingerprint, partitioned by
fingerprint across executors (RocksDB/HDFS state store on a cluster); the
per-batch work is a key-partitioned shuffle of (fingerprint, id) pairs —
the same single-shuffle shape as the batch dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from simsearch_spark.functions.text import doc_fingerprint

OUTPUT_SCHEMA = "fingerprint long, keeper long, n_docs long"
STATE_SCHEMA = "n long"


def dedup_docs_stream(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """First-seen fingerprint dedup over a streaming DataFrame of documents."""
    fp = docs.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))

    def first_seen(key, pdfs, state):
        import pandas as pd

        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        if state.exists:
            (n,) = state.get
            state.update((n + len(ids),))
            return iter(())
        state.update((len(ids),))
        return iter(
            [pd.DataFrame({"fingerprint": [key[0]], "keeper": [min(ids)], "n_docs": [len(ids)]})]
        )

    return fp.groupBy("fingerprint").applyInPandasWithState(
        first_seen, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
