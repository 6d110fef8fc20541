"""Set operators — SURVEY.md §2.7 rows 45-48.

SPARQL UNION is bag union [spec:SPARQL 1.1 §18.2.2.2]; DISTINCT layers on
top.  INTERSECT/EXCEPT round out the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import query
from ..core.tables import load


@query("q_union_all", oracle="""
SELECT event_id, user_id, 'click' AS src FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, 'view' AS src FROM events WHERE event_type = 'view'
""")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name (SPARQL UNION)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("src")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("view").alias("src")
    )
    return clicks.unionByName(views)


@query("q_union_distinct", oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'purchase'
""")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@query("q_intersect", oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query("q_except", oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'purchase'
""")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-user click occurrences minus
    purchase occurrences — SPARQL MINUS on full rows generalized to bags."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b)


@query("q_intersect_all", oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
""")
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag INTERSECT ALL (each user_id kept min(#clicks, #views) times) —
    completes the multiset side of the set-op family (q_except already
    exercises EXCEPT ALL; q_intersect is the distinct form).  Spark plans
    intersectAll as one aggregate of per-side counts + a generate — a
    single shuffle on the value, no join of the two subqueries."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "view").select("user_id")
    return a.intersectAll(b)
