"""Result post-processing (SURVEY.md §2.6 R1-R3).

R1 extra columns: report attributes not used as similarity criteria.
Reference batches ``IN (ids)`` lookups (``SearchHandler.java:772-834``);
Spark-first this is a broadcast join of the k-row result against the base
table — the scan is column-pruned to exactly the extra columns.

R2 similarity matrix: k×k pairwise weighted similarity between result
entities (``engine/processor/ResultMatrix.java:62-124``; skipped when k>50,
gate at ``SearchResponseFormat.java:122-126``).  A self-crossJoin of k≤50
rows is trivially cheap at any corpus scale because it runs on the *result*,
not the data.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simsearch_spark.functions import measures
from simsearch_spark.plans.spec import Facet


def attach_extra_columns(
    result: DataFrame, base: DataFrame, key_column: str, extra_columns: list[str]
) -> DataFrame:
    """R1: left-join extra attributes onto the ranked result.  The result side
    is k rows → broadcast it, keeping the base-table side shuffle-free."""
    pruned = base.select(key_column, *extra_columns)
    return F.broadcast(result).join(pruned, on=key_column, how="left")


def similarity_matrix(
    result: DataFrame,
    facets: list[Facet],
    key_column: str,
    scales: dict[str, float],
    weights: dict[str, float] | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """R2: pairwise weighted similarity between all result pairs, using the
    same per-facet decayed-similarity measures and scale factors as the query
    (ResultMatrix.java:62-124 re-uses the facet measures verbatim).

    Output: (left, right, sim) for all k² ordered pairs, diagonal included —
    matching the reference's full matrix shape.
    """
    ws = weights or {f.name: 1.0 for f in facets}
    total_w = sum(ws.values())

    needed = [c for f in facets for c in f.value_cols]
    left = result.select(
        F.col(key_column).alias("left"), *[F.col(c).alias(f"l_{c}") for c in needed]
    )
    right = result.select(
        F.col(key_column).alias("right"), *[F.col(c).alias(f"r_{c}") for c in needed]
    )
    pairs = left.crossJoin(right)

    sims = []
    for f in facets:
        scale = F.lit(float(scales[f.name]))
        if f.kind == "numerical":
            d = measures.abs_diff(F.col(f"l_{f.value_cols[0]}"), F.col(f"r_{f.value_cols[0]}"))
            s = measures.decayed_similarity(d, scale, f.decay)
        elif f.kind == "temporal":
            d = F.abs(
                F.col(f"l_{f.value_cols[0]}").cast("timestamp").cast("double")
                - F.col(f"r_{f.value_cols[0]}").cast("timestamp").cast("double")
            )
            s = measures.decayed_similarity(d, scale, f.decay)
        elif f.kind == "spatial":
            lon, lat = f.value_cols[:2]
            d = measures.planar_distance(
                F.col(f"l_{lon}"), F.col(f"l_{lat}"), F.col(f"r_{lon}"), F.col(f"r_{lat}")
            )
            s = measures.decayed_similarity(d, scale, f.decay)
        elif f.kind in ("categorical", "textual"):
            col = f.value_cols[0]
            d = measures.jaccard_distance(F.col(f"l_{col}"), F.col(f"r_{col}"))
            s = measures.jaccard_similarity_scored(d, scale, f.decay)
        elif f.kind == "vector":
            col = f.value_cols[0]
            d = measures.euclidean_distance(F.col(f"l_{col}"), F.col(f"r_{col}"))
            s = measures.decayed_similarity(d, scale, f.decay)
        else:
            raise ValueError(f"unsupported facet kind {f.kind}")
        sims.append(F.coalesce(s, F.lit(0.0)) * F.lit(ws[f.name]))

    total = functools.reduce(lambda a, b: a + b, sims) / F.lit(total_w)
    if round_digits is not None:
        total = F.round(total, round_digits)
    return pairs.select("left", "right", total.alias("sim"))
