"""Composed analytical queries — multi-operator showcase plans.

The single-operator queries in this package isolate one primitive each;
these compose them the way the reference's downstream dashboards would
(SwarmUI-style multi-pattern SPARQL ≈ multi-join SQL): shipping-priority
(TPC-H Q3 shape) and regional-revenue (TPC-H Q5 shape) — broadcast dims,
one fact shuffle, top-k pushdown, all in a single Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.numeric import dsum, dsum_sql
from ..core.registry import query
from ..core.tables import load


@query("q_analytics_shipping_priority", oracle=f"""
SELECT l.l_orderkey,
       {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""")
def q_analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dim filter → broadcast → fact join →
    grouped revenue → top-10.  One fact pass, one shuffle (the groupBy),
    TakeOrderedAndProject for the limit."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1995-03-15").cast("timestamp")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust),
                                        orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query("q_analytics_regional_revenue", oracle=f"""
SELECT n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
GROUP BY n.n_name
""")
def q_analytics_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: a 5-table star join — region→nation→supplier chain
    collapses into one broadcast dim, lineitem⋈orders is the single
    large-large join, then one groupBy shuffle."""
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    dim = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(revenue).alias("revenue"))
    )
