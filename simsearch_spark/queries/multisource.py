"""Declared query: multi-source rank aggregation — facets living on
*different* tables joined on the entity key (the reference's vertical
per-attribute decomposition, ``Coordinator.java:75``; full-outer semantics
with absent entities scoring 0 per facet, ``RankAggregator.java:239-241``).

Facet A: customer.c_acctbal (numerical).  Facet B: the customer's maximum
order total, derived from orders — a second "attribute map" keyed by the
same entity.  Customers with no orders still rank through facet A.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simsearch_spark.operators.rank_agg import multi_source_topk
from simsearch_spark.plans.spec import Facet
from simsearch_spark.queries.core import K, NUM_Q
from simsearch_spark.sources.registry import load_table

PRICE_Q = 150_000.0
W_BAL, W_PRICE = 0.6, 0.4


def q_multi_source_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    maxprice = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    facets = [
        Facet(name="bal", kind="numerical", value_cols=["c_acctbal"], query_value=NUM_Q),
        Facet(name="price", kind="numerical", value_cols=["max_price"], query_value=PRICE_Q),
    ]
    out = multi_source_topk(
        {"bal": cust, "price": maxprice},
        facets,
        "c_custkey",
        K,
        weights={"bal": W_BAL, "price": W_PRICE},
    )
    return out.select(
        F.col("c_custkey").alias("id"),
        F.col("score"),
        F.round(F.coalesce(F.col("bal_sim"), F.lit(0.0)), 6).alias("bal_sim"),
        F.round(F.coalesce(F.col("price_sim"), F.lit(0.0)), 6).alias("price_sim"),
    )


SQL_MULTI_SOURCE_TOPK = f"""
WITH mp AS (
  SELECT o_custkey AS id, max(o_totalprice) AS max_price FROM orders GROUP BY o_custkey
), da AS (
  SELECT c_custkey AS id, abs(c_acctbal - {NUM_Q}) AS dist FROM customer WHERE c_acctbal IS NOT NULL
), db AS (
  SELECT id, abs(max_price - {PRICE_Q}) AS dist FROM mp WHERE max_price IS NOT NULL
), sa AS (
  SELECT max(dist) AS scale_a FROM (SELECT dist FROM da ORDER BY dist LIMIT {K})
), sb AS (
  SELECT max(dist) AS scale_b FROM (SELECT dist FROM db ORDER BY dist LIMIT {K})
), sima AS (
  SELECT id, exp(-0.05 * dist / (CASE WHEN scale_a <= 0 THEN 1.0 ELSE scale_a END)) AS sim_a
  FROM da, sa
), simb AS (
  SELECT id, exp(-0.05 * dist / (CASE WHEN scale_b <= 0 THEN 1.0 ELSE scale_b END)) AS sim_b
  FROM db, sb
), joined AS (
  SELECT coalesce(a.id, b.id) AS id, coalesce(sim_a, 0.0) AS sim_a, coalesce(sim_b, 0.0) AS sim_b
  FROM sima a FULL OUTER JOIN simb b ON a.id = b.id
)
SELECT id, round(({W_BAL} * sim_a + {W_PRICE} * sim_b) / {W_BAL + W_PRICE}, 6) AS score,
       round(sim_a, 6) AS bal_sim, round(sim_b, 6) AS price_sim
FROM joined
ORDER BY round(({W_BAL} * sim_a + {W_PRICE} * sim_b) / {W_BAL + W_PRICE}, 6) DESC, id
LIMIT {K}
"""


MULTISOURCE_QUERIES = {
    "multi_source_topk": (q_multi_source_topk, SQL_MULTI_SOURCE_TOPK),
}
