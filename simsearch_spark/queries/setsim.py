"""Declared queries: categorical/textual top-k (K4/K5) and result shaping
(R1 extra columns, R2 similarity matrix)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.functions.text import tokenize
from simsearch_spark.operators.postprocess import attach_extra_columns, similarity_matrix
from simsearch_spark.operators.topk import single_facet_topk
from simsearch_spark.plans.spec import Facet
from simsearch_spark.queries.core import K, NUM_Q, QGRAMS_SQL, _decay_sql
from simsearch_spark.sources.registry import load_table

CAT_Q = ["spark", "join", "table", "window"]
TEXT_Q2 = "red widget"

# DuckDB fragments ------------------------------------------------------------

# tokenize: split on single space, drop empties, dedupe (list_sort for
# canonical form; set ops don't care) — matches functions.text.tokenize
TOKENIZE_SQL = "list_sort(list_distinct(list_filter(string_split({s}, ' '), t -> t <> '')))"


def _jaccard_dist_sql(a: str, b: str) -> str:
    """1 - |A∩B|/|A∪B| with distinct input lists (union = |A|+|B|-isect)."""
    isect = f"len(list_intersect({a}, {b}))"
    return (
        f"(CASE WHEN len({a}) + len({b}) - {isect} = 0 THEN 0.0 "
        f"ELSE 1.0 - {isect}::DOUBLE / (len({a}) + len({b}) - {isect})::DOUBLE END)"
    )


def _jaccard_sim_sql(dist: str, scale: str) -> str:
    """Decayed sim with the disjoint-set special case (DecayedSimilarity.java:69-70)."""
    return (
        f"round(CASE WHEN {dist} >= 1.0 THEN 0.0 ELSE "
        f"exp(-0.05 * {dist} / (CASE WHEN {scale} <= 0 THEN 1.0 ELSE {scale} END)) END, 6)"
    )


# -----------------------------------------------------------------------------
# K4: categorical (keyword-set) top-k over documents.text tokens
# -----------------------------------------------------------------------------

def q_cat_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("tokens", tokenize(F.col("text")))
    facet = Facet(name="toks", kind="categorical", value_cols=["tokens"], query_value=CAT_Q)
    res = single_facet_topk(docs, "doc_id", facet, k=K)
    return res.select(
        F.col("doc_id").alias("id"), F.col("dist"), F.col("score"), F.col("rank")
    )


_qtoks = "['join', 'spark', 'table', 'window']"
_dtoks = TOKENIZE_SQL.format(s="text")

SQL_CAT_TOPK = f"""
WITH base AS (
  SELECT doc_id AS id, {_jaccard_dist_sql(_dtoks, _qtoks)} AS dist
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT max(dist) AS scale FROM (SELECT dist FROM base ORDER BY dist LIMIT {K})
)
SELECT id, dist, {_jaccard_sim_sql('dist', 'scale')} AS score,
       row_number() OVER (ORDER BY dist, id) AS rank
FROM base, s ORDER BY dist, id LIMIT {K}
"""


# -----------------------------------------------------------------------------
# K5: textual top-k via 3-gram Jaccard over part names
# -----------------------------------------------------------------------------

def q_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    facet = Facet(name="pname", kind="textual", value_cols=["p_name"], query_value=TEXT_Q2)
    res = single_facet_topk(part, "p_partkey", facet, k=K)
    return res.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("value"),
        F.col("dist"),
        F.col("score"),
        F.col("rank"),
    )


_pgrams = QGRAMS_SQL.format(s="p_name")
_qgrams_lit = QGRAMS_SQL.format(s=f"'{TEXT_Q2}'")

SQL_TEXT_TOPK = f"""
WITH base AS (
  SELECT p_partkey AS id, p_name AS value,
         {_jaccard_dist_sql(_pgrams, _qgrams_lit)} AS dist
  FROM part WHERE p_name IS NOT NULL
), s AS (
  SELECT max(dist) AS scale FROM (SELECT dist FROM base ORDER BY dist LIMIT {K})
)
SELECT id, value, dist, {_jaccard_sim_sql('dist', 'scale')} AS score,
       row_number() OVER (ORDER BY dist, id) AS rank
FROM base, s ORDER BY dist, id LIMIT {K}
"""


# -----------------------------------------------------------------------------
# R1: extra columns joined onto the ranked result (SearchHandler.java:772-834)
# -----------------------------------------------------------------------------

def q_extra_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    facet = Facet(name="acctbal", kind="numerical", value_cols=["c_acctbal"], query_value=NUM_Q)
    res = single_facet_topk(cust, "c_custkey", facet, k=K)
    out = attach_extra_columns(res, cust, "c_custkey", ["c_name", "c_mktsegment"])
    return out.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("value"),
        F.col("score"),
        F.col("rank"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


SQL_EXTRA_COLUMNS = f"""
WITH base AS (
  SELECT c_custkey AS id, c_acctbal AS value, abs(c_acctbal - {NUM_Q}) AS dist
  FROM customer WHERE c_acctbal IS NOT NULL
), s AS (
  SELECT max(dist) AS scale FROM (SELECT dist FROM base ORDER BY dist LIMIT {K})
), topk AS (
  SELECT id, value, {_decay_sql('dist', 'scale')} AS score,
         row_number() OVER (ORDER BY dist, id) AS rank
  FROM base, s ORDER BY dist, id LIMIT {K}
)
SELECT t.id, t.value, t.score, t.rank, c.c_name AS name, c.c_mktsegment AS mktsegment
FROM topk t LEFT JOIN customer c ON t.id = c.c_custkey
"""


# -----------------------------------------------------------------------------
# R2: k×k pairwise similarity matrix over the result (ResultMatrix.java:62-124)
# -----------------------------------------------------------------------------

SIM_MATRIX_K = 5
SIM_MATRIX_SCALE = 100.0


def q_sim_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    facet = Facet(
        name="acctbal", kind="numerical", value_cols=["c_acctbal"], query_value=NUM_Q,
        scale=SIM_MATRIX_SCALE,
    )
    res = single_facet_topk(cust, "c_custkey", facet, k=SIM_MATRIX_K)
    return similarity_matrix(
        res, [facet], "c_custkey", scales={"acctbal": SIM_MATRIX_SCALE}
    ).select("left", "right", "sim")


SQL_SIM_MATRIX = f"""
WITH base AS (
  SELECT c_custkey AS id, c_acctbal AS value, abs(c_acctbal - {NUM_Q}) AS dist
  FROM customer WHERE c_acctbal IS NOT NULL
), topk AS (
  SELECT id, value FROM base ORDER BY dist, id LIMIT {SIM_MATRIX_K}
)
SELECT a.id AS "left", b.id AS "right",
       round(exp(-0.05 * abs(a.value - b.value) / {SIM_MATRIX_SCALE}), 6) AS sim
FROM topk a CROSS JOIN topk b
"""


SETSIM_QUERIES = {
    "cat_topk": (q_cat_topk, SQL_CAT_TOPK),
    "text_topk": (q_text_topk, SQL_TEXT_TOPK),
    "extra_columns": (q_extra_columns, SQL_EXTRA_COLUMNS),
    "sim_matrix": (q_sim_matrix, SQL_SIM_MATRIX),
}
