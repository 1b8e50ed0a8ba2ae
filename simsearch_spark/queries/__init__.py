"""Declared-query registry: name -> (spark_callable, duckdb_oracle_sql|None).

Assembled from the per-area modules; __spark_entry__.py at the repo root is a
thin adapter over this registry (the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simsearch_spark.queries.core import CORE_QUERIES

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
REGISTRY.update(CORE_QUERIES)


def _optional(module: str, attr: str) -> None:
    try:
        mod = __import__(f"simsearch_spark.queries.{module}", fromlist=[attr])
        REGISTRY.update(getattr(mod, attr))
    except ImportError:
        pass


_optional("setsim", "SETSIM_QUERIES")
_optional("vector", "VECTOR_QUERIES")
_optional("pipeline", "PIPELINE_QUERIES")
_optional("frontend", "FRONTEND_QUERIES")
_optional("multisource", "MULTISOURCE_QUERIES")
_optional("corpus", "CORPUS_QUERIES")
_optional("media", "MEDIA_QUERIES")
_optional("streaming", "STREAMING_QUERIES")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
