"""Tests for product quantization (operators/pq.py)."""

import random

import pytest
from pyspark.sql import functions as F

from simsearch_spark.operators.pq import pq_adc_topk, pq_encode, pq_train


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_planted_codebook_is_exact(spark):
    """Vectors drawn exactly from ksub distinct subvector values per
    subspace: training recovers them (Lloyd's is a fixed point), every
    encode distance is 0, and ADC top-k equals the exact scan."""
    rng = random.Random(3)
    m, dsub, ksub = 2, 4, 4
    # 4 possible subvectors per subspace, integer-valued (round-6 stable)
    pool = [[float(rng.randint(-5, 5)) for _ in range(dsub)] for _ in range(ksub)]
    pool2 = [[float(rng.randint(-5, 5)) for _ in range(dsub)] for _ in range(ksub)]
    vecs = []
    for i in range(64):
        vecs.append(pool[i % ksub] + pool2[(i * 7 + 1) % ksub])
    df = _frame(spark, vecs).persist()
    books = pq_train(df, "vec_id", "embedding", m=m, ksub=ksub, iters=3)
    enc = pq_encode(df, "vec_id", "embedding", books).persist()
    dists = enc.agg(F.max("dist_0"), F.max("dist_1")).first()
    assert dists[0] == 0.0 and dists[1] == 0.0

    q = vecs[5]
    adc = [r.vec_id for r in pq_adc_topk(enc, "vec_id", books, q, 10).collect()]
    # exact scan: since quantization is lossless here, ADC == exact L2 order
    from simsearch_spark.functions.measures import euclidean_distance

    exact = [
        r.vec_id
        for r in df.select(
            "vec_id",
            F.round(euclidean_distance(F.col("embedding"), F.lit(q)), 6).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    assert adc == exact


def test_adc_candidates_plus_rerank_recall_on_live_fixture(spark, sf_dir):
    """The production PQ serving shape — ADC scan as the CANDIDATE stage,
    exact re-rank of the short list (the IVF-PQ pattern): on the real
    embeddings, ADC top-100 candidates re-ranked exactly must recover
    nearly all of the exact L2 top-10.  (The fixture's embeddings are
    near-uniform random — distances concentrate, the hardest case for
    quantization — so direct ADC top-10 is NOT expected to be exact;
    candidates + re-rank is the documented contract.)"""
    from simsearch_spark.functions.measures import euclidean_distance
    from simsearch_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").persist()
    books = pq_train(emb, "vec_id", "embedding", m=8, ksub=16, iters=2)
    enc = pq_encode(emb, "vec_id", "embedding", books).persist()
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    cand = pq_adc_topk(enc, "vec_id", books, q, 100).select("vec_id")
    rerank = [
        r.vec_id
        for r in cand.join(emb, "vec_id")
        .select(
            "vec_id",
            euclidean_distance(F.col("embedding"), F.lit(q)).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    exact = [
        r.vec_id
        for r in emb.select(
            "vec_id",
            euclidean_distance(F.col("embedding"), F.lit(q)).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    assert len(set(rerank) & set(exact)) >= 8, (rerank, exact)
    # survivors keep the exact order (re-rank IS the exact metric)
    common = [v for v in exact if v in set(rerank)]
    assert [v for v in rerank if v in set(common)] == common


def test_encode_plan_is_shuffle_free(spark):
    """The 100 TB contract: PQ encode is a pure projection — the corpus
    never moves.  The executed plan must contain no Exchange."""
    vecs = [[float(i % 7), float(i % 3), float(-i % 5), 1.0] for i in range(40)]
    df = _frame(spark, vecs)
    books = pq_train(df, "vec_id", "embedding", m=2, ksub=4, iters=1)
    plan = (
        pq_encode(df, "vec_id", "embedding", books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_dim_must_divide_and_empty_frame(spark):
    df = _frame(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "vec_id", "embedding", m=2, ksub=2)
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty, "vec_id", "embedding", m=1, ksub=2)


def test_encode_passthrough_and_code_range(spark):
    vecs = [[float(i % 7), float(i % 3), float(-i % 5), 1.0] for i in range(40)]
    df = _frame(spark, vecs).withColumn("label", F.col("vec_id") % 4)
    books = pq_train(df, "vec_id", "embedding", m=2, ksub=4, iters=1)
    enc = pq_encode(df, "vec_id", "embedding", books)
    assert set(enc.columns) == {"vec_id", "label", "code_0", "dist_0", "code_1", "dist_1"}
    stats = enc.agg(
        F.min("code_0"), F.max("code_0"), F.min("code_1"), F.max("code_1")
    ).first()
    assert stats[0] >= 0 and stats[1] <= 3 and stats[2] >= 0 and stats[3] <= 3
