"""Benchmark contamination (operators/contamination.py): semantics on a
hand-built corpus plus the broadcast-join plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from simsearch_spark.operators.contamination import contamination_report, kgram_hashes


def _docs(spark):
    rows = [
        # eval doc (id % 13 == 0)
        (0, "alpha beta gamma delta"),
        # fully contained in eval doc 0 (same 3-gram set subset)
        (1, "alpha beta gamma"),
        # half contaminated: shares 'beta gamma delta', adds novel tail
        (2, "beta gamma delta epsilon zeta"),
        # disjoint
        (3, "one two three four"),
        # short doc: single partial k-gram, not in eval
        (4, "tiny"),
        # NULL and blank: contribute nothing
        (5, None),
        (6, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kgram_hashes_distinct_and_partial(spark):
    g = kgram_hashes(_docs(spark), "doc_id", "text", k=3)
    counts = {r.doc_id: r.n for r in g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # 4 tokens -> 2 trigrams; 3 tokens -> 1; 5 tokens -> 3; 1 token -> 1 partial
    assert counts == {0: 2, 1: 1, 2: 3, 3: 2, 4: 1}
    # repeated grams collapse: "a b a b a b" has 2 distinct trigrams
    rep = spark.createDataFrame([(9, "a b a b a b")], "doc_id long, text string")
    assert kgram_hashes(rep, "doc_id", "text", k=3).count() == 2


def test_contamination_report_semantics(spark):
    g = kgram_hashes(_docs(spark), "doc_id", "text", k=3)
    ev = g.where(F.col("doc_id") % 13 == 0)
    tr = g.where(F.col("doc_id") % 13 != 0)
    rows = {r.doc_id: (r.n_grams, r.n_contam, r.contam_ratio)
            for r in contamination_report(tr, ev).collect()}
    assert rows[1] == (1, 1, 1.0)        # fully contaminated
    assert rows[2] == (3, 1, round(1 / 3, 6))
    assert rows[3] == (2, 0, 0.0)
    assert rows[4] == (1, 0, 0.0)
    assert set(rows) == {1, 2, 3, 4}     # eval + empty docs absent


def test_contamination_broadcasts_eval_side(spark):
    g = kgram_hashes(_docs(spark), "doc_id", "text", k=3)
    ev = g.where(F.col("doc_id") % 13 == 0)
    tr = g.where(F.col("doc_id") % 13 != 0)
    plan = contamination_report(tr, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_oversized_eval_falls_back_to_shuffle_join(spark):
    """Above broadcast_gram_limit the eval side must NOT be broadcast-hinted.

    With autoBroadcastJoinThreshold disabled, only an explicit F.broadcast
    hint can produce a BroadcastHashJoin — so the guard's two branches are
    observable: limit=None forces the hint (broadcast survives), limit=0
    drops it (shuffled join).  Results must be identical on both paths.
    """
    g = kgram_hashes(_docs(spark), "doc_id", "text", k=3)
    ev = g.where(F.col("doc_id") % 13 == 0)
    tr = g.where(F.col("doc_id") % 13 != 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = contamination_report(tr, ev, broadcast_gram_limit=None)
        guarded = contamination_report(tr, ev, broadcast_gram_limit=0)
        fplan = forced._jdf.queryExecution().executedPlan().toString()
        gplan = guarded._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in fplan
        assert "BroadcastHashJoin" not in gplan and "BroadcastExchange" not in gplan
        key = lambda r: r.doc_id  # noqa: E731
        assert sorted(guarded.collect(), key=key) == sorted(forced.collect(), key=key)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
