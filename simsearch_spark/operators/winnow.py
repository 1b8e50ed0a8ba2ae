"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) —
the local-algorithm fingerprinting used by MOSS-style overlap detection.

Per document: hash every k-gram of tokens (char-fold polynomial hash, the
repo-wide oracle-checkable base hash), slide a window of ``w`` consecutive
k-gram hashes, and keep the MINIMUM of each window (rightmost position on
ties).  The guarantee: any token run long enough to span a full window
shares at least one selected fingerprint between two documents, while only
~2/(w+1) of all k-grams are kept — a tunable density/recall dial.

Scale shape: selection is per-document LOCAL, so the entire operator is one
``mapInPandas`` Arrow pass — no shuffle, no window exchange; the only
distributed work downstream is the overlap self-join on the (pruned)
fingerprint table.  Rightmost-tie argmin is encoded as an integer composite
key ``h * 2^20 + (2^20 - 1 - pos)`` so the DuckDB oracle reproduces the
selection bit-for-bit with plain window functions (min over a trailing
frame) — an independent SQL re-derivation of the numpy path.

Reference parity note: the reference engine has no fingerprinting operator;
this is part of the training-data-pipeline surface (text analysis /
dedup candidate generation) the Spark engine adds.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: position packing base for the rightmost-tie argmin composite key;
#: bounds k-gram positions per document to 2^20 (chunk longer docs first)
POS_P = 1 << 20


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(id, pos, fp): winnowed fingerprints per document.

    Tokens are the raw single-space split (the shingle contract shared with
    MinHash, ``minhash_banded_frame``); a document shorter than ``k`` tokens
    contributes its single partial k-gram; NULL/blank documents contribute
    nothing.  Windows are the trailing frames of ``min(w, n_kgrams)`` rows —
    a short document still yields the rightmost min of everything it has
    (the window degenerates gracefully instead of dropping the doc).
    """
    import numpy as np
    import pandas as pd

    from simsearch_spark.functions.hashing import MOD as _MOD

    id_dtype = dict(df.dtypes)[id_col]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_pos, out_fp = [], [], []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                if t is None or t.strip() == "":
                    continue
                words = t.split(" ")
                n_kg = max(len(words) - (k - 1), 1)
                if n_kg >= POS_P:
                    raise ValueError(
                        f"document {doc_id}: {n_kg} k-grams >= 2^20 position bound; "
                        "chunk long documents before winnowing"
                    )
                hs = np.empty(n_kg, dtype=np.int64)
                for i in range(n_kg):
                    h = 0
                    for c in " ".join(words[i : i + k]):
                        h = (h * 31 + ord(c)) % _MOD
                    hs[i] = h
                # composite key: min -> smallest hash, ties -> rightmost pos
                keys = hs * POS_P + (POS_P - 1 - np.arange(n_kg, dtype=np.int64))
                eff_w = min(w, n_kg)
                wins = np.lib.stride_tricks.sliding_window_view(keys, eff_w)
                sel = np.unique(wins.min(axis=1))
                out_id.extend([doc_id] * len(sel))
                out_pos.extend((POS_P - 1 - (sel % POS_P)).tolist())
                out_fp.extend((sel // POS_P).tolist())
            yield pd.DataFrame({id_col: out_id, "pos": out_pos, "fp": out_fp})

    return df.select(id_col, text_col).mapInPandas(
        proc, f"{id_col} {id_dtype}, pos long, fp long"
    )


def winnow_overlap_pairs(
    fingerprints: DataFrame,
    id_col: str,
    min_shared: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing ≥ ``min_shared``
    distinct winnowed fingerprints — the MOSS candidate-pair step.

    Stop-fingerprint cut first: a fingerprint present in more than
    ``max_df`` documents (boilerplate k-grams) is dropped BEFORE the
    self-join, the same document-frequency prune every inverted-index
    AllPairs engine applies — without it one viral k-gram makes an
    O(df²) bucket.  The join is then a key-partitioned equi-join on the
    fingerprint value; output is bounded by true overlap, never corpus².
    """
    d = fingerprints.select(F.col(id_col).alias("id"), "fp").distinct()
    rare = (
        d.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp")
    )
    pruned = d.join(rare, "fp")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
