"""Sort / limit / top-k — SURVEY.md §2.6 rows 42-44 (SPARQL ORDER BY/slice).

The driver's value-hash is order-insensitive, so each query's sort
semantics are made observable through row SELECTION (LIMIT after ORDER BY):
a wrong sort returns a different rowset.  Top-k compiles to
TakeOrderedAndProject — per-partition heaps, no global sort, the only
formulation that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import query
from ..core.tables import load


@query("q_sort_multi", oracle="""
WITH nulled AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
)
SELECT c_custkey, c_mktsegment, bal
FROM nulled
ORDER BY c_mktsegment ASC NULLS LAST, bal DESC NULLS LAST, c_custkey ASC
LIMIT 100
""")
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY with NULLS LAST (nulls synthesized from
    negative balances so the null placement is actually exercised)."""
    cust = load(spark, sf_dir, "customer")
    nulled = cust.select(
        "c_custkey", "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    # Every sort key carries an explicit null placement: Spark's bare
    # asc() is NULLS FIRST while ANSI/DuckDB default ASC to NULLS LAST —
    # under the LIMIT a null segment would select a different rowset the
    # moment the column has nulls.
    return nulled.orderBy(
        F.col("c_mktsegment").asc_nulls_last(),
        F.col("bal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    ).limit(100)


@query("q_limit_offset", oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50 OFFSET 100
""")
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET slice (SPARQL slice); total order via unique tiebreak."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
    )


@query("q_topk", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""")
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k → TakeOrderedAndProject (no global sort)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )
