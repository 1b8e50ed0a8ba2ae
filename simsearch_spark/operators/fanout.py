"""Kernel fan-out: spread a small scan across the session's cores before
an expensive per-row kernel.

Why this exists (r14, guide §2.5 "input skew"): parquet split planning
floors tiny inputs at ONE scan task — a single small file is one split
(``openCostInBytes`` dominates ``bytesPerCore``), and a parquet file only
splits at row-group boundaries anyway.  Every row-local kernel downstream
of such a scan (Arrow media decodes, shingling + MinHash permutations,
winnow fingerprints, BPE encode, langid scoring) therefore ran on ONE
core regardless of ``local[N]`` or cluster size, serializing exactly the
operators whose per-row cost is highest.

``fanout_for_kernel`` hash-repartitions the frame to the session's
default parallelism — but ONLY when the frame currently has fewer
partitions than that, so at 100 TB (thousands of scan splits) it is a
no-op and no gratuitous exchange enters the plan.  Hash partitioning on
the caller's id column is deterministic under task retries (no
round-robin, no sort-before-repartition cost) and never changes what any
query computes — only where its rows are evaluated.

The shuffle this adds at small scale moves the PRE-kernel rows (ids +
raw payloads) once; for every call site here the kernel's per-row cost
dwarfs one extra network hop of its input — the §8 worked-example trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_for_kernel(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition ``df`` by ``key_col`` to the session's default
    parallelism when (and only when) it currently has fewer partitions.
    Physical-plan only: result sets are identical either way.

    Streaming frames pass through untouched: their partitioning is the
    micro-batch source's to decide (and ``.rdd`` is not defined on them);
    the batch frames inside foreachBatch sinks still qualify."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key_col)
