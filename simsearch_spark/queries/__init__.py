"""Declared-query registry: name -> (spark_callable, duckdb_oracle_sql|None).

Imports are deliberately NOT guarded: a broken query module must fail loudly
at import time, not silently shrink the driver's correctness surface.
__spark_entry__.py at the repo root is a thin adapter over this registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simsearch_spark.queries.core import CORE_QUERIES
from simsearch_spark.queries.corpus import CORPUS_QUERIES
from simsearch_spark.queries.frontend import FRONTEND_QUERIES
from simsearch_spark.queries.ivf import IVF_QUERIES
from simsearch_spark.queries.media import MEDIA_QUERIES
from simsearch_spark.queries.multisource import MULTISOURCE_QUERIES
from simsearch_spark.queries.pipeline import PIPELINE_QUERIES
from simsearch_spark.queries.setsim import SETSIM_QUERIES
from simsearch_spark.queries.streaming import STREAMING_QUERIES
from simsearch_spark.queries.vector import VECTOR_QUERIES

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _part in (
    CORE_QUERIES,
    SETSIM_QUERIES,
    VECTOR_QUERIES,
    PIPELINE_QUERIES,
    FRONTEND_QUERIES,
    MULTISOURCE_QUERIES,
    CORPUS_QUERIES,
    MEDIA_QUERIES,
    IVF_QUERIES,
    STREAMING_QUERIES,
):
    _overlap = set(REGISTRY) & set(_part)
    if _overlap:
        raise ValueError(f"duplicate declared-query names: {sorted(_overlap)}")
    REGISTRY.update(_part)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
