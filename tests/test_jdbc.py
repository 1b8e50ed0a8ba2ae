"""S2 JDBC in-situ source, exercised end-to-end against embedded Derby.

The reference's JDBC connector mounts database tables and pushes per-query
SQL down to the database (``manager/insitu/JdbcConnector.java:1-224``,
pushdown construction ``engine/processor/insitu/SimSearchJdbcQuery.java:
119-177``).  The Spark analog is ``spark.read.jdbc`` behind
``Catalog.register_source`` — Catalyst builds the pushdown (PushedFilters
on the JDBCRelation scan) instead of hand-built SQL strings.

Derby ships inside the Spark distribution (it backs the Hive metastore), so
this round-trip needs no external database or network.  If a distribution
ever drops the jar, the whole module skips with the exact requirement.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import pyspark
from simsearch_spark.sources.catalog import Catalog
from simsearch_spark.sources.registry import load_table

_DERBY_JARS = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar"))

pytestmark = pytest.mark.skipif(
    not _DERBY_JARS,
    reason="embedded Derby jar (derby-*.jar) missing from pyspark/jars — "
    "JDBC round-trip needs any JDBC driver on the Spark classpath",
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_source(spark, sf_dir, tmp_path_factory):
    """customer fixture → Derby table → (url, properties)."""
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": DRIVER}
    src = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey")
        .limit(200)
    )
    src.write.jdbc(url, "customer_jdbc", mode="overwrite", properties=props)
    return url, props, src.count()


def test_jdbc_mount_search_roundtrip(spark, sf_dir, jdbc_source):
    """Mount a JDBC table and run the numerical top-k through it — the same
    search path as the parquet mounts, source swapped underneath."""
    url, props, n_src = jdbc_source
    cat = Catalog(spark)
    df = cat.register_source(
        "customer_jdbc", jdbc_url=url, jdbc_table="customer_jdbc", jdbc_properties=props
    )
    assert df.count() == n_src
    cat.mount("acctbal", "customer_jdbc", "c_custkey", "c_acctbal", "numerical_topk")
    got = cat.search({"acctbal": 500.0}, k=5).collect()
    assert len(got) == 5
    assert all(r.score is not None for r in got)
    # parity with the same search on the parquet-backed frame
    pq = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    ).limit(200)
    cat2 = Catalog(spark)
    cat2.register_source("customer_pq", df=pq)
    cat2.mount("acctbal", "customer_pq", "c_custkey", "c_acctbal", "numerical_topk")
    want = cat2.search({"acctbal": 500.0}, k=5).collect()
    assert [(r.c_custkey, r.score) for r in got] == [(r.c_custkey, r.score) for r in want]


def test_jdbc_filter_pushdown_reaches_scan(spark, jdbc_source):
    """The reference pushes query SQL into the database
    (SimSearchJdbcQuery.java:119-177); Spark must do the equivalent —
    the filter shows up as PushedFilters on the JDBC scan, not as a
    post-scan Filter over a full table fetch."""
    url, props, _ = jdbc_source
    df = spark.read.jdbc(url, "customer_jdbc", properties=props)
    plan = (
        df.where(F.col("c_acctbal") > 1000.0)
        .select("c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "c_acctbal" in plan.split("PushedFilters", 1)[1][:200]


def test_json_source_mount_roundtrip(spark, sf_dir, tmp_path):
    """S1 generality: a JSON-lines dataset mounts through the same path as
    parquet/csv and yields identical search results."""
    pq = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    path = str(tmp_path / "cust_json")
    pq.write.json(path)
    cat = Catalog(spark)
    cat.register_source("cust_json", path=path, fmt="json")
    cat.mount("acctbal", "cust_json", "c_custkey", "c_acctbal", "numerical_topk")
    got = [(r.c_custkey, r.score) for r in cat.search({"acctbal": 500.0}, k=5).collect()]
    cat2 = Catalog(spark)
    cat2.register_source("cust_pq", df=pq)
    cat2.mount("acctbal", "cust_pq", "c_custkey", "c_acctbal", "numerical_topk")
    want = [(r.c_custkey, r.score) for r in cat2.search({"acctbal": 500.0}, k=5).collect()]
    assert got == want and len(got) == 5
