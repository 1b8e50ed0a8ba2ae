"""k-means + quantization operator invariants (the declared queries'
oracle parity checks values; these pin algorithmic properties that hold
under ANY partitioning — the 1000-executor contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simsearch_spark.operators.kmeans import kmeans_assign
from simsearch_spark.operators.quantize import QUANT_LEVELS, quantization_error
from simsearch_spark.sources.registry import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kmeans_partitioning_invariance(spark, sf_dir):
    """Cluster assignment must be a pure function of the data, not of the
    physical layout: 1-partition and 16-partition runs agree exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign(emb.coalesce(1), "vec_id", "embedding", k=4, iters=2)
    b = kmeans_assign(emb.repartition(16), "vec_id", "embedding", k=4, iters=2)
    sel = lambda d: d.select("vec_id", "cluster_id", F.round("dist", 6).alias("d"))
    assert _rows(sel(a)) == _rows(sel(b))


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    """Lloyd's monotonicity: total within-cluster squared distance after 2
    iterations is ≤ after 1 (rounding grain tolerance)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def inertia(iters):
        out = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=iters)
        return out.agg(F.sum(F.col("dist") * F.col("dist"))).first()[0]

    assert inertia(2) <= inertia(1) + 1e-3

    # every point sits in SOME cluster, exactly once
    out = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=2)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()


def test_quantization_error_bound(spark, sf_dir):
    """Affine int8 codes bound the per-dimension error by scale/2 (interior)
    — so the per-vector L2 error is ≤ sqrt(dim) · max_scale/2 + slack."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    qerr = quantization_error(emb, "vec_id", "embedding")
    max_err = qerr.agg(F.max("err")).first()[0]

    flat = emb.select(F.posexplode("embedding").alias("pos", "v"))
    widest = (
        flat.groupBy("pos")
        .agg(((F.max(F.col("v").cast("double")) - F.min(F.col("v").cast("double"))) / QUANT_LEVELS).alias("sc"))
        .agg(F.max("sc"))
        .first()[0]
    )
    assert max_err <= math.sqrt(dim) * widest / 2 + 1e-6
    assert qerr.count() == emb.count()
