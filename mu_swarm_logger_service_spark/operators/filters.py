"""Projection & filter operators — SURVEY.md §2.2 rows 9-13.

The reference filters Docker events with a status guard at the top of each
handler [pub:muswarmlogger/loggers/docker.py]; SPARQL adds FILTER / BIND
semantics [spec:SPARQL 1.1 §17].  All predicates here are Catalyst-native
(pushed to the scan, whole-stage codegen'd) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.numeric import epoch_s, measure
from ..core.registry import query
from ..core.tables import load


@query("q_project_compute", oracle="""
SELECT
  event_id,
  upper(event_type) AS etype_u,
  value * 2.0 AS value_2x,
  strftime(ts, '%Y-%m-%d') AS event_date,
  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM events
""")
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns (SPARQL BIND; the reference's
    epoch→timestamp conversion [pub:muswarmlogger/events.py .time]).

    Dates are emitted as ISO strings: DuckDB DATE surfaces as midnight
    datetime through pandas, so a date-typed column is representation-
    ambiguous under the driver's value hash."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_u"),
        (F.col("value") * 2.0).alias("value_2x"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        epoch_s("ts").alias("epoch_s"),
    )


@query("q_filter_status", oracle="""
SELECT event_id, event_type, user_id, value
FROM events
WHERE event_type IN ('error', 'purchase') AND value > 100.0
""")
def q_filter_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's event-status guard re-expressed: keep only relevant
    event types [pub:muswarmlogger/loggers/docker.py status check]."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("error", "purchase") & (F.col("value") > 100.0)
    ).select("event_id", "event_type", "user_id", "value")


@query("q_filter_compound", oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
WHERE (l_returnflag = 'R' OR l_quantity BETWEEN 10.0 AND 15.0)
  AND NOT (l_linestatus = 'F')
  AND l_suppkey IN (1, 2, 3, 4, 5)
""")
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction / disjunction / negation / BETWEEN / IN (SPARQL FILTER)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R")
         | F.col("l_quantity").between(10.0, 15.0))
        & ~(F.col("l_linestatus") == "F")
        & F.col("l_suppkey").isin(1, 2, 3, 4, 5)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@query("q_filter_like_regex", oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE (text LIKE '%spark%' OR regexp_matches(text, 'agg (row|line)'))
  AND source LIKE 'src1%'
""")
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / regex predicates (SPARQL REGEX / STRSTARTS)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(
        (F.col("text").like("%spark%") | F.col("text").rlike("agg (row|line)"))
        & F.col("source").startswith("src1")
    ).select("doc_id", "lang", "source")


@query("q_filter_null", oracle="""
WITH nulled AS (
  SELECT event_id,
         CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, COALESCE(v, -1.0) AS v_filled,
       (v IS NOT DISTINCT FROM NULL) AS v_is_null
FROM nulled
WHERE v IS NULL OR v > 400.0
""")
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling (SPARQL BOUND) + null-safe equality."""
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 50.0, F.lit(None)).otherwise(F.col("value"))
    nulled = ev.select("event_id", v.alias("v"))
    return (
        nulled.filter(F.col("v").isNull() | (F.col("v") > 400.0))
        .select(
            "event_id",
            F.coalesce(F.col("v"), F.lit(-1.0)).alias("v_filled"),
            F.col("v").eqNullSafe(F.lit(None).cast("double")).alias("v_is_null"),
        )
    )


@query("q_values_inline", oracle="""
SELECT v.event_type, v.weight, COUNT(*) AS n,
       CAST(SUM(CAST((CASE WHEN abs(value) < 1e21 THEN value END)
                     * v.weight AS DECIMAL(27,6))) AS DOUBLE)
         AS weighted_value
FROM events e
JOIN (VALUES ('click', 1.0), ('purchase', 5.0), ('error', 0.5))
       v(event_type, weight)
  ON e.event_type = v.event_type
GROUP BY v.event_type, v.weight
""")
def q_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL VALUES clause [spec:SPARQL 1.1 §10.2]: inline bindings joined
    against the data — engine-side, a literal DataFrame broadcast against
    the fact (zero shuffle on the fact side)."""
    ev = load(spark, sf_dir, "events")
    values = ev.sparkSession.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("error", 0.5)],
        "event_type string, weight double",
    )
    return (
        ev.join(F.broadcast(values), "event_type")
        .groupBy("event_type", "weight")
        .agg(F.count(F.lit(1)).alias("n"),
             # measure(): class-L gate before the decimal cast
             F.sum((measure(F.col("value")) * F.col("weight"))
                   .cast("decimal(27,6)"))
             .cast("double").alias("weighted_value"))
    )
