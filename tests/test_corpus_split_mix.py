"""Leakage-safe split + source mixing weights (queries/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simsearch_spark.queries.corpus import (
    VAL_MOD,
    q_source_mix_weights,
    q_split_leakage_safe,
)


def test_split_never_straddles_components(spark, sf_dir):
    """The whole point: every member of a near-dup component gets the same
    split, so no near-duplicate pair can straddle train/val."""
    out = q_split_leakage_safe(spark, sf_dir).cache()
    try:
        straddled = (
            out.groupBy("root")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert straddled == 0
        splits = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(splits) == {"train", "val"}
        # hash split lands near 1/VAL_MOD of roots in val (loose: 3x band)
        total = sum(splits.values())
        assert 0 < splits["val"] < 3 * total / VAL_MOD
    finally:
        out.unpersist()


def test_split_assignment_is_deterministic(spark, sf_dir):
    a = {r.doc_id: r.split for r in q_split_leakage_safe(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in q_split_leakage_safe(spark, sf_dir).collect()}
    assert a == b


def test_hybrid_rrf_fuses_both_rankings(spark, sf_dir):
    """RRF output must carry members of both input rankings (at fixture
    scale both lists contribute), score consistent with the rank formula."""
    from simsearch_spark.queries.corpus import RRF_C, q_hybrid_rrf_topk

    rows = q_hybrid_rrf_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    assert any(r.rank_bm25 is not None for r in rows)
    assert any(r.rank_cos is not None for r in rows)
    for r in rows:
        want = sum(1.0 / (RRF_C + rk) for rk in (r.rank_bm25, r.rank_cos) if rk is not None)
        assert abs(r.rrf_score - want) < 1e-6
        assert r.rank_bm25 is not None or r.rank_cos is not None
    # descending fused order, ties by doc_id
    key = [(-r.rrf_score, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_mix_weights_normalized_and_monotone(spark, sf_dir):
    rows = q_source_mix_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    # α=0.5 keeps ordering: more tokens -> no smaller weight
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    weights = [r.mix_weight for r in by_tokens]
    assert weights == sorted(weights)
    # temperature flattens: largest/smallest weight ratio < raw token ratio
    lo, hi = by_tokens[0], by_tokens[-1]
    if lo.n_tokens < hi.n_tokens:
        assert hi.mix_weight / lo.mix_weight < hi.n_tokens / lo.n_tokens
