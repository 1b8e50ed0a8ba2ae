"""Sequence packing (operators/packing.py): FFD invariants, overflow
contract, and physical-partitioning invariance."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from simsearch_spark.functions.text import token_count
from simsearch_spark.operators.packing import pack_sequences
from simsearch_spark.sources.registry import load_table

BUDGET = 256


def _packed(spark, sf_dir, **kw):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, "doc_id", "n_tokens", BUDGET, **kw), docs


def test_every_doc_packed_exactly_once(spark, sf_dir):
    out, docs = _packed(spark, sf_dir)
    n_docs = docs.where(F.col("n_tokens").isNotNull()).count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_bins_respect_budget_and_overflow_contract(spark, sf_dir):
    out, _docs = _packed(spark, sf_dir)
    rows = out.collect()
    bins = defaultdict(list)
    for r in rows:
        bins[(r.bucket, r.bin_idx)].append(r)
    for members in bins.values():
        total = sum(r.n_tokens for r in members)
        if any(r.overflow for r in members):
            # overflow bins hold exactly one over-budget doc
            assert len(members) == 1 and members[0].n_tokens > BUDGET
        else:
            assert total <= BUDGET
    for r in rows:
        assert r.overflow == (r.n_tokens > BUDGET)


def test_bin_count_is_near_optimal(spark, sf_dir):
    """FFD per bucket: bins never fall below the volume lower bound and stay
    within the FFD guarantee of it."""
    out, _docs = _packed(spark, sf_dir)
    per_bucket = (
        out.where(~F.col("overflow"))
        .groupBy("bucket")
        .agg(F.sum("n_tokens").alias("tot"), F.countDistinct("bin_idx").alias("n_bins"))
        .collect()
    )
    for r in per_bucket:
        lower = -(-r.tot // BUDGET)
        assert lower <= r.n_bins <= int(lower * 11 / 9) + 2, r


def test_packing_invariant_to_physical_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    a = {r.doc_id: (r.bucket, r.bin_idx) for r in
         pack_sequences(docs, "doc_id", "n_tokens", BUDGET).collect()}
    b = {r.doc_id: (r.bucket, r.bin_idx) for r in
         pack_sequences(docs.repartition(13), "doc_id", "n_tokens", BUDGET).collect()}
    assert a == b
