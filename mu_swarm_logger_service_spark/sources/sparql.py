"""SPARQL 1.1 query-form parity beyond SELECT — SURVEY.md §2 [Q] surface.

The reference's query capability is the SPARQL 1.1 endpoint it feeds
[pub:muswarmlogger/main.py via MU_SPARQL_ENDPOINT]; SURVEY.md §2 covered
the SELECT algebra (BGP, OPTIONAL, FILTER, aggregates).  This module adds
the remaining query forms [spec:SPARQL 1.1 Query §16] plus property paths
[spec:SPARQL 1.1 §9], which §2.12 deferred:

- **property path** (`dependsOn+`): transitive closure via semi-naive
  BFS iteration — each round joins the previous frontier with the edge
  relation, exactly how Datalog engines evaluate recursion.  The frontier
  shrinks geometrically on tree/DAG-shaped graphs (depth ≤ log n here),
  so at 100 TB the loop runs O(log n) shuffles on an ever-smaller input;
  lineage is truncated per round with localCheckpoint so the plan doesn't
  grow with depth.
- **CONSTRUCT**: a graph-producing query — solution sequence → new
  triples, i.e. groupBy + per-predicate projection UNION.
- **ASK**: boolean existence — a global aggregate over the BGP.
- **DESCRIBE**: all triples about one resource — a pushdown-friendly
  subject filter on the narrow table.

The dependency graph for the path query is minted deterministically from
the event data (container c_i depends on c_{i//2} — a binary tree over
the 150 container ids at sf0.01), so the DuckDB WITH RECURSIVE oracle is
value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import query
from ..core.tables import load
from .triples import DCT, RDF_TYPE, SWARMUI


def container_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic `swarmui:dependsOn` edge relation: container c_i
    depends on c_{i//2} (binary tree rooted at c0) over the distinct
    container ids present in the event stream."""
    ids = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").cast("long").alias("uid"))
        .distinct()
    )
    return ids.filter(F.col("uid") >= 1).select(
        F.concat(F.lit("c"), F.col("uid").cast("string")).alias("child"),
        F.concat(F.lit("c"), (F.col("uid") / 2).cast("long").cast("string"))
        .alias("parent"),
    )


@query("q_sparql_path", oracle="""
WITH RECURSIVE ids AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM events
), edges AS (
  SELECT 'c' || CAST(uid AS VARCHAR) AS child,
         'c' || CAST(uid // 2 AS VARCHAR) AS parent
  FROM ids WHERE uid >= 1
), paths AS (
  SELECT child AS src, parent AS dst, 1 AS depth FROM edges
  UNION ALL
  SELECT p.src, e.parent, p.depth + 1
  FROM paths p JOIN edges e ON p.dst = e.child
)
SELECT src, dst, CAST(depth AS BIGINT) AS depth FROM paths
""")
def q_sparql_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property path `?src swarmui:dependsOn+ ?dst` [spec:SPARQL
    1.1 §9.1]: transitive closure by semi-naive iteration.  Only the
    NEW pairs found in round k join the edges in round k+1 (the frontier),
    so total work is O(edges × depth) not O(pairs × depth); the loop stops
    on the first empty frontier (depth ≈ log₂ n on this tree)."""
    edges = container_edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)  # reused every round

    frontier = edges.select(
        F.col("child").alias("src"), F.col("parent").alias("dst"),
        F.lit(1).cast("long").alias("depth"),
    ).localCheckpoint(eager=True)
    paths = frontier
    while True:
        nxt = (
            frontier.join(edges, frontier.dst == edges.child)
            .select(frontier.src, F.col("parent").alias("dst"),
                    (frontier.depth + 1).alias("depth"))
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        if nxt.isEmpty():
            break
        paths = paths.union(nxt)
        frontier = nxt
    return paths


@query("q_sparql_construct", oracle=f"""
WITH alerts AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS c, COUNT(*) AS n
  FROM events WHERE event_type = 'error'
  GROUP BY user_id HAVING COUNT(*) >= 20
), res AS (
  SELECT 'http://swarmui.semte.ch/resources/containers/' || c AS s, n
  FROM alerts
)
SELECT s, '{RDF_TYPE}' AS p, '{SWARMUI}AlertedContainer' AS o FROM res
UNION ALL
SELECT s, '{SWARMUI}alertCount', CAST(n AS VARCHAR) FROM res
""")
def q_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT [spec:SPARQL 1.1 §16.2] — graph-producing query:

        CONSTRUCT { ?c a swarmui:AlertedContainer ;
                    swarmui:alertCount ?n }
        WHERE { ?e swarmui:eventType "error" ; swarmui:container ?c }
        GROUP BY ?c HAVING (COUNT(*) >= 20)

    The solution sequence (alert-worthy containers) turns into new
    triples via one inline explode — template instantiation is a
    projection, not a second scan."""
    ev = load(spark, sf_dir, "events")
    alerts = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )
    subj = F.concat(
        F.lit("http://swarmui.semte.ch/resources/containers/c"),
        F.col("user_id").cast("string"),
    )
    triple = lambda p, o: F.struct(  # noqa: E731
        F.lit(p).alias("p"), o.cast("string").alias("o")
    )
    return alerts.select(
        subj.alias("s"),
        F.explode(F.array(
            triple(RDF_TYPE, F.lit(SWARMUI + "AlertedContainer")),
            triple(SWARMUI + "alertCount", F.col("n")),
        )).alias("po"),
    ).select("s", F.col("po.p").alias("p"), F.col("po.o").alias("o"))


@query("q_sparql_ask", oracle="""
SELECT EXISTS (
  SELECT 1 FROM events
  WHERE event_type = 'error' AND user_id = 7
) AS answer
""")
def q_sparql_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ASK [spec:SPARQL 1.1 §16.3] — boolean existence of a BGP
    match (`ASK { ?e swarmui:eventType "error" ; swarmui:container "c7" }`).
    Planned as a LIMIT-1 scan aggregated to one boolean — Spark stops at
    the first matching row, it never counts the full table."""
    ev = load(spark, sf_dir, "events")
    hit = (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") == 7))
        .limit(1)
        .select(F.lit(True).alias("answer"))
    )
    return hit.unionAll(
        ev.sparkSession.range(1).select(F.lit(False).alias("answer"))
    ).orderBy(F.col("answer").desc()).limit(1)


@query("q_sparql_describe", oracle=f"""
WITH per_container AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS c,
         COUNT(*) AS n,
         MAX(strftime(ts, '%Y-%m-%dT%H:%M:%SZ')) AS last_seen
  FROM events
  GROUP BY user_id
), target AS (
  SELECT * FROM per_container ORDER BY n DESC, c LIMIT 1
), res AS (
  SELECT 'http://swarmui.semte.ch/resources/containers/' || c AS s, n, last_seen
  FROM target
)
SELECT s, '{RDF_TYPE}' AS p, '{SWARMUI}Container' AS o FROM res
UNION ALL
SELECT s, '{SWARMUI}eventCount', CAST(n AS VARCHAR) FROM res
UNION ALL
SELECT s, '{DCT}modified', last_seen FROM res
""")
def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE [spec:SPARQL 1.1 §16.4] — all triples about one
    resource: the busiest container (max event count, id as tiebreaker).
    The top-1 selection is a TakeOrderedAndProject; the description
    itself is template projection, mirroring how a triplestore answers
    DESCRIBE with a subject-bounded scan."""
    ev = load(spark, sf_dir, "events")
    per = (
        ev.groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.max(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
             .alias("last_seen"))
        .withColumn("c", F.concat(F.lit("c"), F.col("user_id").cast("string")))
    )
    target = per.orderBy(F.col("n").desc(), F.col("c")).limit(1)
    subj = F.concat(F.lit("http://swarmui.semte.ch/resources/containers/"),
                    F.col("c"))
    triple = lambda p, o: F.struct(  # noqa: E731
        F.lit(p).alias("p"), o.cast("string").alias("o")
    )
    return target.select(
        subj.alias("s"),
        F.explode(F.array(
            triple(RDF_TYPE, F.lit(SWARMUI + "Container")),
            triple(SWARMUI + "eventCount", F.col("n")),
            triple(DCT + "modified", F.col("last_seen")),
        )).alias("po"),
    ).select("s", F.col("po.p").alias("p"), F.col("po.o").alias("o"))


@query("q_sql_recursive_cte", oracle="""
WITH RECURSIVE ids AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM events
), edges AS (
  SELECT 'c' || CAST(uid AS VARCHAR) AS child,
         'c' || CAST(uid // 2 AS VARCHAR) AS parent
  FROM ids WHERE uid >= 1
), paths AS (
  SELECT child AS src, parent AS dst, 1 AS depth FROM edges
  UNION ALL
  SELECT p.src, e.parent, p.depth + 1
  FROM paths p JOIN edges e ON p.dst = e.child
)
SELECT src, dst, CAST(depth AS BIGINT) AS depth FROM paths
""")
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same `dependsOn+` transitive closure as q_sparql_path, but as a
    DECLARATIVE `WITH RECURSIVE` CTE (new in Spark 4): the engine runs the
    fixpoint — driver code never loops, checkpoints, or tests a frontier.
    Catalyst plans each recursion step as a self-join on the working
    relation, terminating when the step produces zero rows, i.e. the
    semi-naive evaluation the hand-written loop implements manually.

    Both forms stay registered on purpose: the CTE is the right API for a
    SQL user; the explicit loop (q_sparql_path) remains the template for
    iterations whose step is NOT pure SQL (PageRank's decimal re-ranking,
    label propagation) or that need per-round control (early exit on a
    driver-side metric).  Identical output, same DuckDB oracle shape."""
    from ..core.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE ids AS (
          SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM events
        ), edges AS (
          SELECT concat('c', CAST(uid AS STRING)) AS child,
                 concat('c', CAST(uid div 2 AS STRING)) AS parent
          FROM ids WHERE uid >= 1
        ), paths AS (
          SELECT child AS src, parent AS dst, 1 AS depth FROM edges
          UNION ALL
          SELECT p.src, e.parent, p.depth + 1
          FROM paths p JOIN edges e ON p.dst = e.child
        )
        SELECT src, dst, CAST(depth AS BIGINT) AS depth FROM paths
    """)
