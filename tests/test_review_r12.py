"""Regression tests for the r12 self-review findings: tombstone
resurrect rejection, stream-pairs write-if-absent, salt+no-cap
validity, delta id-dtype normalization, refresh crash recovery and
shrink guard."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from simsearch_spark.mount import (
    append_rows,
    delete_ids,
    load_manifest,
    mount,
    mount_dedup,
    dedup_append,
    refresh,
)
from simsearch_spark.mount.maintain import compact_codes
from simsearch_spark.queries.pipeline import MINHASH_T, N_BANDS, N_HASHES
from simsearch_spark.sources.registry import load_table


@pytest.fixture()
def docs_stub(spark):
    return spark.createDataFrame(
        [(i, f"stub doc {i} some words") for i in range(10)],
        "doc_id long, text string",
    )


def test_tombstoned_id_not_reusable_until_compaction(spark, sf_dir, docs_stub, tmp_path):
    """Insert → delete → append(same id) must FAIL LOUDLY (the code row
    still occupies the id); after compact_codes the id is reusable."""
    d = str(tmp_path / "m")
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    mount(spark, "", d, emb_frame=emb, docs_frame=docs_stub, dedup=False)
    delete_ids(spark, d, [7])
    resurrect = emb.where(F.col("vec_id") == 7).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="tombstoned"):
        append_rows(spark, d, emb_delta=resurrect)
    assert compact_codes(spark, d) == 1
    n0 = load_manifest(d)["counts"]["n_vectors"]
    append_rows(spark, d, emb_delta=resurrect)  # reusable post-compaction
    assert load_manifest(d)["counts"]["n_vectors"] == n0 + 1


def test_stream_pairs_write_if_absent(spark, sf_dir, tmp_path):
    """A batch directory that already carries _SUCCESS (committed by a
    pre-crash run BEFORE the index update) is never overwritten — the
    replay's residual recompute cannot clobber the full pair set."""
    from simsearch_spark.mount.dedup import stream_dedup_append

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 300)
    delta = docs.where(F.col("doc_id") >= 300)
    d = str(tmp_path / "m")
    mount_dedup(spark, d, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS)

    pairs_dir = str(tmp_path / "pairs")
    sentinel = spark.createDataFrame(
        [(111, 222, 0.987654)], "id_a long, id_b long, jaccard double"
    )
    sentinel.write.parquet(os.path.join(pairs_dir, "batch_id=0"))

    src = str(tmp_path / "src")
    delta.select("doc_id", "text").write.parquet(src + "/b0")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src + "/*")
    q = stream_dedup_append(
        spark, d, stream, pairs_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = spark.read.parquet(os.path.join(pairs_dir, "batch_id=0")).collect()
    assert [tuple(r) for r in got] == [(111, 222, 0.987654)]  # preserved
    # ... while the index update still happened
    assert load_manifest(d)["dedup"]["n_docs"] == docs.count()

    # and a vector-only mount fails synchronously, not per-batch
    d2 = str(tmp_path / "m2")
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    docs_stub = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    mount(spark, "", d2, emb_frame=emb, docs_frame=docs_stub, dedup=False)
    with pytest.raises(ValueError, match="no dedup artifacts"):
        stream_dedup_append(spark, d2, stream, pairs_dir)


def test_salt_mode_with_no_cap_is_plain_join(spark, sf_dir, tmp_path):
    """hot_mode='salt' with bucket_cap=None must behave exactly like the
    uncapped plain join (no bucket is hot), batch AND incremental —
    previously it raised a misleading ValueError on every append."""
    from simsearch_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 350)
    plain = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", MINHASH_T, N_HASHES, N_BANDS, bucket_cap=None
        ).collect()
    )
    salted = sorted(
        tuple(r)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", MINHASH_T, N_HASHES, N_BANDS,
            bucket_cap=None, hot_mode="salt",
        ).collect()
    )
    assert salted == plain

    d = str(tmp_path / "m_saltnone")
    base = docs.where(F.col("doc_id") < 250)
    mount_dedup(
        spark, d, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS,
        bucket_cap=None, hot_mode="salt",
    )
    got = dedup_append(spark, d, docs.where(F.col("doc_id") >= 250))
    ids = [r.doc_id for r in docs.where(F.col("doc_id") >= 250).select("doc_id").collect()]
    want = [
        tuple(r)
        for r in spark.createDataFrame(plain, "id_a long, id_b long, jaccard double")
        .where(F.col("id_a").isin(ids) | F.col("id_b").isin(ids))
        .collect()
    ]
    assert sorted(tuple(r) for r in got.collect()) == sorted(want)


def test_delta_id_dtype_normalized_to_mounted(spark, sf_dir, tmp_path):
    """xxhash64 is type-sensitive: an INT-typed delta against a
    LONG-typed mount must still prune the right sbkt partitions — same
    pairs as the long-typed delta, and idempotency intact."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 300)
    delta = docs.where(F.col("doc_id") >= 300)
    delta_int = delta.withColumn("doc_id", F.col("doc_id").cast("int"))

    d = str(tmp_path / "m_long")
    mount_dedup(spark, d, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS)
    assert load_manifest(d)["dedup"]["id_dtype"] == "bigint"
    got_int = sorted(tuple(r) for r in dedup_append(spark, d, delta_int).collect())

    d2 = str(tmp_path / "m_long2")
    mount_dedup(spark, d2, base, threshold=MINHASH_T, n_hashes=N_HASHES, bands=N_BANDS)
    got_long = sorted(tuple(r) for r in dedup_append(spark, d2, delta).collect())
    assert got_int == got_long and len(got_int) > 0

    # idempotency survives the dtype mismatch too
    again = dedup_append(spark, d, delta_int)
    assert again.count() == 0


def test_refresh_crash_recovery_and_shrink_guard(spark, sf_dir, docs_stub, tmp_path):
    """A refresh that crashed between its two renames leaves __old
    intact; the next refresh restores it and proceeds.  A retrain frame
    covering fewer vectors than mounted is rejected (appended rows would
    silently vanish) unless allow_shrink=True."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    d = str(tmp_path / "m")
    mount(spark, "", d, emb_frame=emb, docs_frame=docs_stub, dedup=False)
    n0 = load_manifest(d)["counts"]["n_vectors"]

    # simulate the crash window: mount_dir renamed away, __next absent
    os.rename(d, d + "__old")
    man = refresh(spark, d, sf_dir="", emb_frame=emb, docs_frame=docs_stub, dedup=False)
    assert man["generation"] == 1
    assert load_manifest(d)["counts"]["n_vectors"] == n0
    assert not os.path.isdir(d + "__old") and not os.path.isdir(d + "__next")

    # shrink guard
    smaller = emb.where(F.col("vec_id") < 100)
    with pytest.raises(ValueError, match="silently vanish"):
        refresh(spark, d, sf_dir="", emb_frame=smaller, docs_frame=docs_stub, dedup=False)
    assert load_manifest(d)["generation"] == 1  # old generation untouched
    man = refresh(
        spark, d, sf_dir="", emb_frame=smaller, docs_frame=docs_stub,
        dedup=False, allow_shrink=True,
    )
    assert man["generation"] == 2
    assert load_manifest(d)["counts"]["n_vectors"] == smaller.count()
