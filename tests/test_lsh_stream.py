"""Streaming MinHash-LSH near-dup detection (streaming/lshdedup.py) vs the
batch band-join: candidate-set equality under any micro-batch split, and
verified-pair equality after the shared exact-Jaccard post-pass."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from simsearch_spark.operators.dedup import (
    minhash_banded_frame,
    minhash_lsh_pairs,
    verify_shingle_pairs,
)
from simsearch_spark.streaming.lshdedup import minhash_candidates_stream

N_HASHES, BANDS, SHINGLE_N, THRESHOLD = 16, 4, 3, 0.7


def _batch_candidates(docs, id_col="doc_id"):
    banded = minhash_banded_frame(
        docs.where(F.col("text").isNotNull() & (F.trim(F.col("text")) != "")),
        id_col, "text", N_HASHES, BANDS, SHINGLE_N,
    )
    expl = banded.select(F.col(id_col), F.posexplode("bands").alias("band_idx", "band_hash"))
    left = expl.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    right = expl.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    ), banded


def _run_stream(spark, schema, path, name):
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(path))
    )
    q = (
        minhash_candidates_stream(
            stream, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N
        )
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT DISTINCT id_a, id_b FROM {name}")


def test_stream_candidates_equal_batch_for_any_split(spark, sf_dir, tmp_path):
    """Three-way split with near-dup groups straddling every boundary: the
    distinct streamed candidate set must equal the batch band join's, and
    the verified pairs must equal minhash_lsh_pairs on the full corpus."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    # inject near-dups across slices: echo 15 docs with light edits so
    # bucket membership straddles micro-batches
    max_id = pc.max(t.column("doc_id")).as_py()
    echo = t.slice(0, 15).to_pylist()
    for i, row in enumerate(echo):
        row["doc_id"] = max_id + 1 + i
        words = row["text"].split()
        row["text"] = " ".join(words[:-1] if len(words) > 4 else words)
    t = pa.concat_tables([t, pa.Table.from_pylist(echo, schema=t.schema)])

    d = tmp_path / "slices"
    d.mkdir()
    mod = pc.bit_wise_and(t.column("doc_id"), 3)
    for s in range(3):
        part = t.filter(pc.equal(mod, s) if s < 2 else pc.greater_equal(mod, 2))
        pq.write_table(part, str(d / f"s{s}.parquet"))
    full = tmp_path / "full.parquet"
    pq.write_table(t, str(full))
    docs = spark.read.parquet(str(full))

    streamed = _run_stream(spark, docs.schema, d, "t_lsh_stream3")
    batch_cand, banded = _batch_candidates(docs)
    s_pairs = {(r.id_a, r.id_b) for r in streamed.collect()}
    b_pairs = {(r.id_a, r.id_b) for r in batch_cand.collect()}
    assert s_pairs == b_pairs and len(b_pairs) > 0

    # shared verification tail: streamed candidates -> same verified output
    s_ver = {
        (r.id_a, r.id_b, r.jaccard)
        for r in verify_shingle_pairs(streamed, banded, "doc_id", THRESHOLD).collect()
    }
    b_ver = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", THRESHOLD, N_HASHES, BANDS, SHINGLE_N
        ).collect()
    }
    assert s_ver == b_ver and len(b_ver) > 0


def test_stream_single_batch_equals_multi_batch(spark, sf_dir, tmp_path):
    """Split-invariance directly: one slice vs per-parity slices produce the
    identical distinct candidate set."""
    t = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, 120)
    one = tmp_path / "one"
    two = tmp_path / "two"
    one.mkdir()
    two.mkdir()
    pq.write_table(t, str(one / "all.parquet"))
    parity = pc.bit_wise_and(t.column("doc_id"), 1)
    pq.write_table(t.filter(pc.equal(parity, 0)), str(two / "a.parquet"))
    pq.write_table(t.filter(pc.equal(parity, 1)), str(two / "b.parquet"))
    schema = spark.read.parquet(str(one)).schema
    p1 = {(r.id_a, r.id_b) for r in _run_stream(spark, schema, one, "t_lsh_one").collect()}
    p2 = {(r.id_a, r.id_b) for r in _run_stream(spark, schema, two, "t_lsh_two").collect()}
    assert p1 == p2


def test_embedding_stream_candidates_equal_batch_for_any_split(spark, sf_dir, tmp_path):
    """Streaming sign-LSH (r8): the distinct streamed candidate set equals
    the batch band join on the full frame for a 3-way split with planted
    near-dups straddling every boundary; planted echoes are always found."""
    from simsearch_spark.operators.ann import lcg_hyperplanes, lsh_bucket
    from simsearch_spark.streaming.lshdedup import embedding_candidates_stream

    n_planes, band_bits, seed = 16, 4, 7
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    dim = len(t.column("embedding")[0].as_py())
    max_id = pc.max(t.column("vec_id")).as_py()
    echo = t.slice(0, 12).to_pylist()
    for i, row in enumerate(echo):
        row["vec_id"] = max_id + 1 + i  # exact vector dups under new ids
    t = pa.concat_tables([t, pa.Table.from_pylist(echo, schema=t.schema)])

    d = tmp_path / "vslices"
    d.mkdir()
    mod = pc.bit_wise_and(t.column("vec_id"), 3)
    for s in range(3):
        part = t.filter(pc.equal(mod, s) if s < 2 else pc.greater_equal(mod, 2))
        pq.write_table(part, str(d / f"s{s}.parquet"))
    full = tmp_path / "vfull.parquet"
    pq.write_table(t, str(full))
    vecs = spark.read.parquet(str(full))

    stream = (
        spark.readStream.format("parquet").schema(vecs.schema)
        .option("maxFilesPerTrigger", 1).load(str(d))
    )
    q = (
        embedding_candidates_stream(
            stream, dim, n_planes=n_planes, band_bits=band_bits, planes_seed=seed
        )
        .writeStream.format("memory").queryName("t_vec_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    s_pairs = {
        (r.id_a, r.id_b)
        for r in spark.sql("SELECT DISTINCT id_a, id_b FROM t_vec_stream").collect()
    }

    planes = lcg_hyperplanes(dim, n_planes, seed=seed)
    n_bands = n_planes // band_bits
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    expl = (
        vecs.select(F.col("vec_id"), lsh_bucket(v, planes).alias("bits"))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band_idx"),
            "bits",
        )
        .withColumn(
            "band_hash",
            F.expr(f"shiftright(bits, band_idx * {band_bits}) & {(1 << band_bits) - 1}"),
        )
    )
    left = expl.select(F.col("vec_id").alias("id_a"), "band_idx", "band_hash")
    right = expl.select(F.col("vec_id").alias("id_b"), "band_idx", "band_hash")
    b_pairs = {
        (r.id_a, r.id_b)
        for r in left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct().collect()
    }
    assert s_pairs == b_pairs and len(b_pairs) > 0
    # an exact vector dup shares every band -> its pair must be present
    for i in range(12):
        orig = echo[i]["vec_id"] - (max_id + 1)
        assert (orig, echo[i]["vec_id"]) in s_pairs
