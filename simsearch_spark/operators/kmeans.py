"""Deterministic distributed k-means (Lloyd's) over an embedding column.

The document-clustering step of a training-data pipeline (domain discovery,
cluster-balanced sampling, dedup-block seeding).  Same execution shape as
Spark MLlib's KMeans — per iteration: one corpus pass to assign points to
broadcast centroids, one groupBy to re-average them — but fully
deterministic so a SQL oracle can replay it bit-for-bit:

- init = the embeddings of the ``k`` LOWEST ids (no RNG);
- assignment = strict-``<`` argmin over L2, which keeps the lowest
  cluster id on ties (the oracle's ``row_number() ORDER BY dist,
  cluster_id`` is the identical rule);
- centroid components are ROUNDED to 6 decimals each iteration, pinning
  the only order-nondeterministic float sum (the cross-row mean) so both
  engines fold identical doubles thereafter.

100 TB design: per iteration the corpus is scanned once with map-side
partial aggregation for the means; only k×dim rounded doubles ever reach
the driver (k=8, dim=64 → 512 values), the same bounded-centroid-collect
contract as IVF training (operators/ann.py).  The corpus itself never
shuffles for assignment — distances are evaluated in whole-stage codegen
against literal centroid arrays.

Reference scope note: the reference engine has no clustering operator
(clusters arrive pre-labeled, e.g. ``pivoting/` uses data-dependent pivot
selection instead); this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simsearch_spark.functions.measures import euclidean_distance


def _lit_vec(vals: list[float]) -> Column:
    return F.lit([float(v) for v in vals])


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: dict[int, list[float]]
) -> DataFrame:
    """Add ``cluster_id`` (nearest centroid, L2; lowest id wins ties) and
    ``dist`` columns.  Pure column expressions — no shuffle, no UDF.

    The argmin is ``array_min`` over (dist, cluster_id) structs: Spark's
    struct ordering compares dist first, then cluster_id, which is exactly
    the strict-``<``/lowest-id-on-ties rule.  Each centroid's distance
    expression appears ONCE — a folded when-chain would re-embed every
    prior distance inside each comparison, doubling the codegen tree per
    centroid (k=8 produced multi-MiB task binaries and dominated runtime
    with JIT compilation, not data)."""
    items = sorted(centroids.items())
    vec = F.col(vec_col)
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    euclidean_distance(vec, _lit_vec(cvec)).alias("dist"),
                    F.lit(cid).alias("cluster_id"),
                )
                for cid, cvec in items
            ]
        )
    )
    return df.withColumn("cluster_id", best["cluster_id"]).withColumn("dist", best["dist"])


def _rounded_means(assigned: DataFrame, vec_col: str) -> dict[int, list[float]]:
    """Per-cluster element-wise mean, rounded to 6 decimals IN-ENGINE (so the
    driver never re-rounds with Python's banker's rounding).  One corpus
    pass with map-side combine; result is k×dim rows."""
    rows = (
        assigned.select("cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("cluster_id", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("mv"))
        .collect()
    )
    out: dict[int, dict[int, float]] = {}
    for r in rows:
        out.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = float(r["mv"])
    return {cid: [d[p] for p in sorted(d)] for cid, d in out.items()}


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` deterministic Lloyd iterations and return ``df`` with
    final ``cluster_id`` + ``dist`` columns.  Empty clusters keep their
    previous centroid (mirrored by the oracle's LEFT JOIN + coalesce)."""
    init_rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: F.round(x.cast("double"), 6)).alias("c"))
        .collect()
    )
    cents = {i: [float(v) for v in r["c"]] for i, r in enumerate(init_rows)}
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, cents)
        means = _rounded_means(assigned, vec_col)
        cents = {cid: means.get(cid, old) for cid, old in cents.items()}
    return assign_clusters(df, vec_col, cents)
