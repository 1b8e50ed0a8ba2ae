"""Sequence packing: assign documents to fixed token-budget bins — the
step that turns a cleaned corpus into dense fixed-length training examples
(padding waste is the single biggest token sink in naive pipelines).

Shape: documents are hash-assigned to ``n_buckets`` independent packing
buckets (a DATA property — hash of the id — so the result is invariant to
physical partitioning), and each bucket runs deterministic first-fit-
decreasing greedy packing in one ``applyInPandas`` group: sort by
(n_tokens desc, id asc), place each doc into the first bin with room,
open a new bin otherwise.  Bin ids are (bucket, bin_idx) pairs.

Scale: packing quality needs only bucket-local context (FFD is within a
constant factor of optimal), so buckets parallelize across executors with
one key-partitioned shuffle of (id, n_tokens) pairs — document TEXT never
moves; the assignment joins back to the corpus on id.  Bucket count trades
parallelism against packing efficiency (more buckets = more partially
filled last bins; the waste is O(n_buckets · budget) tokens total, which
vanishes at corpus scale).

Documents longer than the budget get a single-doc overflow bin flagged
``overflow = true`` — the caller decides between chunking them first
(operators' doc_chunks) and dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, bucket, bin_idx, overflow): deterministic FFD packing
    of each hash bucket into bins of ``budget`` tokens."""
    import pandas as pd

    id_dtype = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_dtype}, n_tokens long, bucket int, bin_idx long, overflow boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True], kind="mergesort")
        fills: list[int] = []  # running fill per open bin
        assign: list[int] = []
        overflow: list[bool] = []
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if nt > budget:
                assign.append(len(fills))
                fills.append(nt)
                overflow.append(True)
                continue
            # first-fit over open bins (bucket-sized, not corpus-sized)
            for i, fl in enumerate(fills):
                if fl + nt <= budget:
                    assign.append(i)
                    fills[i] = fl + nt
                    break
            else:
                assign.append(len(fills))
                fills.append(nt)
            overflow.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "n_tokens": pdf["n_tokens"].values,
                "bucket": pdf["bucket"].values,
                "bin_idx": assign,
                "overflow": overflow,
            }
        )

    base = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
    ).where(F.col("n_tokens").isNotNull())
    return base.groupBy("bucket").applyInPandas(pack, out_schema)
