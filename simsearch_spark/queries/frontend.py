"""Declared queries: SQL front-end (§2.8), word2vec transform (§1.2),
z-normalized search (ZNormal path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.functions.text import char_fold_hash, tokenize
from simsearch_spark.operators.topk import single_facet_topk
from simsearch_spark.operators.transform import word2vec_transform, z_normalize
from simsearch_spark.plans.sql_frontend import execute_search_sql
from simsearch_spark.plans.spec import Facet
from simsearch_spark.queries.core import K, NUM_Q, QGRAMS_SQL, TEXT_Q
from simsearch_spark.queries.pipeline import _charfold_sql
from simsearch_spark.queries.setsim import TOKENIZE_SQL, _jaccard_dist_sql
from simsearch_spark.sources.registry import load_table

SQL_QUERY_TEXT = (
    f"SELECT c_mktsegment FROM customer WHERE c_acctbal ~= {NUM_Q} "
    f"AND c_name ~= '{TEXT_Q}' WEIGHTS 0.7, 0.3 LIMIT {K}"
)


def q_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: the conjunctive similarity SQL dialect end-to-end — parse,
    bind facet kinds from the schema, execute, attach extra columns."""
    cust = load_table(spark, sf_dir, "customer")
    out = execute_search_sql(spark, cust, "customer", SQL_QUERY_TEXT, "c_custkey")
    return out.select(
        F.col("c_custkey").alias("id"),
        F.col("score"),
        F.col("c_acctbal").alias("value_a"),
        F.col("c_name_sim").alias("name_sim"),
        F.col("c_acctbal_sim").alias("acctbal_sim"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


_qg = QGRAMS_SQL.format(s="c_name")
_qq = QGRAMS_SQL.format(s=f"'{TEXT_Q}'")

SQL_SQL_FRONTEND = f"""
WITH base AS (
  SELECT c_custkey AS id, c_acctbal AS value_a, c_mktsegment,
         abs(c_acctbal - {NUM_Q}) AS dist_a,
         {_jaccard_dist_sql(_qg, _qq)} AS dist_b
  FROM customer
), sa AS (
  SELECT max(dist_a) AS scale_a FROM (SELECT dist_a FROM base WHERE dist_a IS NOT NULL ORDER BY dist_a LIMIT {K})
), sb AS (
  SELECT max(dist_b) AS scale_b FROM (SELECT dist_b FROM base WHERE dist_b IS NOT NULL ORDER BY dist_b LIMIT {K})
), scored AS (
  SELECT id, value_a, c_mktsegment,
         coalesce(exp(-0.05 * dist_a / (CASE WHEN scale_a <= 0 THEN 1.0 ELSE scale_a END)), 0.0) AS sim_a,
         coalesce(CASE WHEN dist_b >= 1.0 THEN 0.0
                       ELSE exp(-0.05 * dist_b / (CASE WHEN scale_b <= 0 THEN 1.0 ELSE scale_b END)) END, 0.0) AS sim_b
  FROM base, sa, sb
)
SELECT id, round((0.7 * sim_a + 0.3 * sim_b) / 1.0, 6) AS score, value_a,
       round(sim_b, 6) AS name_sim, round(sim_a, 6) AS acctbal_sim, c_mktsegment AS mktsegment
FROM scored ORDER BY round((0.7 * sim_a + 0.3 * sim_b) / 1.0, 6) DESC, id LIMIT {K}
"""


# -----------------------------------------------------------------------------
# word2vec transform: token → dictionary vector → element-wise mean
# -----------------------------------------------------------------------------

DICT_MOD = 700  # token → vec_id mapping modulus; > fixture row count at
# sf0.01 so some tokens are dictionary-misses (the skipped-word path)


def q_word2vec_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("tokens", tokenize(F.col("text")))
    emb = load_table(spark, sf_dir, "embeddings")
    # deterministic term dictionary: vocabulary term -> embedding row keyed by
    # char-fold hash mod DICT_MOD (terms hashing past the table are misses)
    vocab = docs.select(F.explode("tokens").alias("term")).distinct()
    dictionary = vocab.withColumn("h", char_fold_hash(F.col("term")) % DICT_MOD).join(
        emb, F.col("h") == F.col("vec_id")
    ).select("term", F.col("embedding").alias("vec"))
    # dim comes from the embeddings table (a 1-row parquet probe), NOT from a
    # dictionary materialization: the r2 shape evaluated the whole
    # vocab->hash->join pipeline twice (dim probe + broadcast rebuild), and
    # the r3 fix still collected the dictionary to the driver and
    # re-parallelized it.  Passing the unmaterialized plan straight to the
    # transform evaluates it exactly once — inside the broadcast exchange —
    # with zero driver round-trip; at corpus scale the driver never holds
    # vocab-sized data.
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(first.d) if first is not None else None
    return word2vec_transform(docs, "doc_id", "tokens", dictionary, flat=True, dim=dim).select(
        "doc_id", "pos", "avg_val"
    )


SQL_WORD2VEC_EMBED = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENIZE_SQL.format(s='text')}) AS token FROM documents
), dict AS (
  SELECT token, embedding FROM (SELECT DISTINCT token FROM toks) v
  JOIN embeddings e ON e.vec_id = {_charfold_sql('token')} % {DICT_MOD}
), joined AS (
  SELECT t.doc_id, d.embedding FROM toks t JOIN dict d USING (token)
), flat AS (
  SELECT doc_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
  FROM joined, unnest(range(1, len(embedding) + 1)) AS u(i)
)
SELECT doc_id, pos, round(avg(val), 6) AS avg_val FROM flat GROUP BY doc_id, pos
"""


# -----------------------------------------------------------------------------
# z-normalized numerical search (ZNormal.java; SearchHandler.java:455-461)
# -----------------------------------------------------------------------------

ZQ = 2.0  # query value in z-space
ZSCALE = 0.5


def q_normalized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    normed, _mean, _std = z_normalize(cust, "c_acctbal", out="bal_z")
    facet = Facet(name="balz", kind="numerical", value_cols=["bal_z"], query_value=ZQ, scale=ZSCALE)
    res = single_facet_topk(normed, "c_custkey", facet, k=K)
    return res.select(
        F.col("c_custkey").alias("id"),
        F.round("bal_z", 6).alias("zvalue"),
        F.col("score"),
        F.col("rank"),
    )


SQL_NORMALIZED_TOPK = f"""
WITH stats AS (SELECT avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS s FROM customer),
base AS (
  SELECT c_custkey AS id,
         CASE WHEN s = 0 THEN 0.0 ELSE (c_acctbal - m) / s END AS z
  FROM customer, stats WHERE c_acctbal IS NOT NULL
)
SELECT id, round(z, 6) AS zvalue,
       round(exp(-0.05 * abs(z - {ZQ}) / {ZSCALE}), 6) AS score,
       row_number() OVER (ORDER BY abs(z - {ZQ}), id) AS rank
FROM base ORDER BY abs(z - {ZQ}), id LIMIT {K}
"""


FRONTEND_QUERIES = {
    "sql_frontend": (q_sql_frontend, SQL_SQL_FRONTEND),
    "word2vec_embed": (q_word2vec_embed, SQL_WORD2VEC_EMBED),
    "normalized_topk": (q_normalized_topk, SQL_NORMALIZED_TOPK),
}
