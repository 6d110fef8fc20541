"""Aggregation operators — SURVEY.md §2.4 rows 26-35.

SPARQL 1.1 aggregates (COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT/SAMPLE, GROUP BY +
HAVING) as exposed by the reference's triplestore, plus the analytics
extensions (grouping sets, stats, percentiles, pivot, HLL) mandated for the
100 TB engine.  All groupBy aggregations rely on Spark's partial (map-side)
aggregation + final merge — one shuffle on the group keys, no collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.numeric import (davg, davg_sql, dsum, dsum_sql,
                            in_measure_domain, measure, measure_sql)
from ..core.registry import query
from ..core.tables import load

# ---------------------------------------------------------------------------
# Row 27 — FLAGSHIP: TPC-H-Q1-style pricing summary.  Drives entry().
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"


def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary per (returnflag, linestatus) — hash groupBy with
    8 aggregates in a single pass (partial agg + one shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
  {dsum_sql('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)')} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

query("q_agg_groupby", oracle=_Q1_SQL)(flagship_pricing_summary)


# ---------------------------------------------------------------------------
# Row 26 — ungrouped (global) aggregation.
# ---------------------------------------------------------------------------

@query("q_agg_global", oracle=f"""
SELECT
  COUNT(*) AS n_rows,
  COUNT(l_quantity) AS n_qty,
  {dsum_sql('l_quantity')} AS sum_qty,
  MIN(l_extendedprice) AS min_price,
  MAX(l_extendedprice) AS max_price,
  {davg_sql('l_extendedprice')} AS avg_price
FROM lineitem
""")
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Row 28 — DISTINCT aggregates (SPARQL COUNT(DISTINCT ...)).
# ---------------------------------------------------------------------------

@query("q_agg_distinct", oracle=f"""
SELECT
  event_type,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
  CAST(SUM(DISTINCT CAST(({measure_sql('value')}) AS DECIMAL(27,6)))
       AS DOUBLE) AS sum_distinct_value
FROM events
GROUP BY event_type
""")
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # measure(): class-L non-finite doubles crash the DISTINCT decimal
    # cast on both engines; out-of-domain values are missing by contract.
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
        F.sum_distinct(measure(F.col("value")).cast("decimal(27,6)"))
        .cast("double").alias("sum_distinct_value"),
    )


# ---------------------------------------------------------------------------
# Row 29 — approximate distinct (HLL).  Values differ across engines →
# rows-only for the driver; tests assert ±5% vs exact (SURVEY.md row 29).
# ---------------------------------------------------------------------------

@query("q_agg_approx_distinct")
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # rsd=0.02: the default 5% sketch breaches the ±5% tolerance at sf0.1
    # (5% is one standard deviation, not a bound) — a tighter sketch keeps
    # the documented tolerance honest at every scale factor.
    #
    # The sketch and the exact count are computed in SEPARATE aggregates
    # and joined on the group key (r13; found by tools/codegen_audit.py):
    # fused into one agg, the countDistinct expand phases drag the HLL
    # partial buffer — 410 longs at rsd=0.02, over codegen.maxFields, so
    # every phase also falls back to interpreted — through the shuffle ON
    # EVERY DISTINCT (event_type, user_id) ROW.  Split, the HLL shuffle is
    # groups x 410 longs and the distinct shuffle is narrow key pairs;
    # interleaved A/B at sf0.1: 0.69-0.73 -> 0.30-0.42 s warm (x2.1),
    # full-collect identical.  The join is null-safe (<=>) so a NULL
    # event_type group survives exactly as the fused form kept it.
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    return (
        approx.alias("a")
        .join(exact.alias("b"), F.expr("a.event_type <=> b.event_type"))
        .select("a.event_type", "a.approx_users", "b.exact_users")
    )


# ---------------------------------------------------------------------------
# Row 30 — GROUPING SETS / ROLLUP / CUBE.
# ---------------------------------------------------------------------------

@query("q_agg_grouping_sets", oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
""")
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-cardinality policy (class K): a rollup of an EMPTY
    relation emits no rows — Spark's distributed semantics (partials
    from nothing produce nothing) — while ANSI/DuckDB synthesize the
    grand-total () row with COUNT 0.  Declared observed-groups-only;
    the oracle's HAVING COUNT(*) > 0 drops exactly that synthetic row
    (every group from a real row has COUNT >= 1, including the grand
    total of a non-empty input)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_agg_cube", oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) AS g_flag,
  GROUPING(l_linestatus) AS g_status,
  {dsum_sql('l_quantity')} AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
""")
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (row 30's third variant beyond GROUPING SETS/ROLLUP): all 2^k
    grouping combinations in one pass — Catalyst expands to a single
    Expand + aggregate, so the input is scanned once and each row feeds
    every combination map-side.  GROUPING() markers disambiguate real
    NULL keys from subtotal rows, exactly as in the oracle.  Class-K
    observed-groups-only policy as in q_agg_grouping_sets (the oracle's
    HAVING drops ANSI's synthetic grand-total row of an empty input)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Row 31 — GROUP_CONCAT (SPARQL) — sorted for determinism.
# ---------------------------------------------------------------------------

@query("q_agg_collect", oracle="""
SELECT
  user_id,
  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR)) AS event_ids
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
""")
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("event_id").cast("string")))
            ).alias("event_ids")
        )
    )


# ---------------------------------------------------------------------------
# Row 32 — statistical aggregates.  stddev/corr are float-order-sensitive →
# round(4) on both sides (values O(1e2); error O(1e-11); safe margin).
# ---------------------------------------------------------------------------

@query("q_agg_stats", oracle=f"""
SELECT
  event_type,
  ROUND(stddev_samp({measure_sql('value')}), 4) AS sd_value,
  ROUND(var_pop({measure_sql('value')}), 4) AS var_value,
  ROUND(corr({measure_sql('value')}, CAST(user_id AS DOUBLE)), 4) + 0.0
    AS corr_vu,
  ROUND(covar_pop({measure_sql('value')}, CAST(user_id AS DOUBLE)), 4) + 0.0
    AS covar_vu
FROM events
GROUP BY event_type
""")
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # measure(): one class-L Inf makes DuckDB STDDEV hard-error ("out of
    # range") where Spark yields NaN — moments run over in-domain values.
    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    mv = measure(F.col("value"))
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp(mv), 4).alias("sd_value"),
        F.round(F.var_pop(mv), 4).alias("var_value"),
        # + 0.0: normalize negative zero (see functions/scalar.py note)
        (F.round(F.corr(mv, uid), 4) + 0.0).alias("corr_vu"),
        (F.round(F.covar_pop(mv, uid), 4) + 0.0).alias("covar_vu"),
    )


# ---------------------------------------------------------------------------
# Row 33 — exact percentiles (NOT percentile_approx: oracle-checked).
# ---------------------------------------------------------------------------

@query("q_agg_percentile", oracle=f"""
SELECT
  event_type,
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY {measure_sql('value')}),
        6) AS p50,
  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY {measure_sql('value')}),
        6) AS p95
FROM events
GROUP BY event_type
""")
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # measure(): class-L NaN/Inf sort greatest in BOTH engines but their
    # interpolation arms differ once a non-finite lands in the top band
    # (measured p95 132.5 vs 132.125) — order statistics run over
    # in-domain values only (both percentile flavors skip NULL).
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr(
            "percentile(CASE WHEN abs(value) < 1e21 THEN value END, 0.5)"),
            6).alias("p50"),
        F.round(F.expr(
            "percentile(CASE WHEN abs(value) < 1e21 THEN value END, 0.95)"),
            6).alias("p95"),
    )


# ---------------------------------------------------------------------------
# Row 34 — pivot (event_type → columns).  Spark pivot yields NULL for empty
# cells; COALESCE to 0 to match the oracle's conditional aggregation.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@query("q_agg_pivot", oracle="""
SELECT
  user_id,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events
GROUP BY user_id
""")
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)  # explicit values: no extra scan
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# Row 35 — HAVING (post-aggregation filter, SPARQL HAVING).
# ---------------------------------------------------------------------------

@query("q_agg_having", oracle=f"""
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  {dsum_sql('o_totalprice')} AS total_spend
FROM orders
GROUP BY o_custkey
HAVING {dsum_sql('o_totalprice')} > 1000000.0
""")
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
        )
        .filter(F.col("total_spend") > 1000000.0)
    )


# ---------------------------------------------------------------------------
# Skew-safe two-level aggregation (SCALE.md): pre-aggregate on a salted key,
# then merge partials.  The decimal SUM is associative, so salting is
# semantics-preserving — the oracle is the UNSALTED GROUP BY.
# ---------------------------------------------------------------------------

@query("q_agg_salted", oracle=f"""
SELECT event_type, COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY event_type
""")
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted aggregation for skewed group keys.

    event_type has only 5 values — at 100 TB a plain groupBy sends ALL rows
    of a hot key to one reducer.  Level 1 aggregates on (key, salt) spreading
    each key over 16 reducers; level 2 merges the 16 partials per key.  The
    shuffle carries 16 rows per key instead of all raw rows.  Results are
    bit-identical to the direct groupBy (associative decimal sums), which
    the oracle checks.
    """
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        # measure(): the hand-written partial must carry dsum's class-L
        # domain gate or one non-finite row crashes the decimal cast
        F.sum(measure(F.col("value")).cast("decimal(27,6)")).alias("psum"),
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pn").alias("n"),
             F.sum("psum").cast("double").alias("sum_value"))
    )


@query("q_agg_approx_percentile")
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL-style sketch
    (``approx_percentile``, accuracy=10000) — the second sketch family
    beside HLL (q_agg_approx_distinct).  At 100 TB the exact
    ``percentile`` (q_agg_percentile) needs a full sort per group; the
    sketch is one pass, mergeable, and bounded-memory.  Rows-only for the
    driver (sketch internals differ across engines); the compensating
    test asserts each approximate quantile lands within the rank-error
    bound of the exact value.  Quantiles come back as scalar columns, not
    one array column — driver output must stay atomic (pandas
    sort_values in its compare crashes on list cells, CORRECTNESS_r01)."""
    ev = load(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return ev.groupBy("event_type").agg(
        F.element_at(pcts, 1).alias("p50"),
        F.element_at(pcts, 2).alias("p95"),
        F.element_at(pcts, 3).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_agg_boolean", oracle="""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS n_errors,
       bool_or(event_type = 'purchase') AS ever_purchased,
       bool_and(value >= 0.0) AS all_nonneg,
       CAST(COUNT(*) FILTER (WHERE value > 90.0) AS BIGINT) AS n_high
FROM events
GROUP BY user_id
HAVING bool_or(event_type = 'purchase')
""")
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/filtered aggregate family (SPARQL EXISTS-style per-group
    predicates): count_if (= COUNT FILTER), bool_or/bool_and (= SQL
    ANY/EVERY) — per-user error counts and purchase flags, keeping only
    users who ever purchased.  All four fold into ONE hash aggregate
    pass (no join against a filtered subquery, which is how the naive
    SQL states it); booleans partial-aggregate map-side like any other
    agg."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
            F.bool_or(F.col("event_type") == "purchase")
            .alias("ever_purchased"),
            F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
            F.count_if(F.col("value") > 90.0).alias("n_high"),
        )
        .filter(F.col("ever_purchased"))
    )


@query("q_agg_winsorize", oracle=f"""
WITH b AS (
  SELECT event_type,
         ROUND(percentile_cont(0.05) WITHIN GROUP (
           ORDER BY {measure_sql('value')}), 6) AS lo,
         ROUND(percentile_cont(0.95) WITHIN GROUP (
           ORDER BY {measure_sql('value')}), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(CASE WHEN ({measure_sql('e.value')}) < b.lo THEN 1 END)
            AS BIGINT) AS n_clipped_low,
       CAST(COUNT(CASE WHEN ({measure_sql('e.value')}) > b.hi THEN 1 END)
            AS BIGINT) AS n_clipped_high,
       {dsum_sql('CASE WHEN abs(e.value) < 1e21 '
                 'THEN LEAST(GREATEST(e.value, b.lo), b.hi) END')}
         AS sum_winsorized
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
""")
def q_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — outlier capping at the exact per-type 5th/95th
    percentiles, the feature-cleaning step that precedes any training on
    heavy-tailed measures.  The tiny per-type threshold table broadcasts
    back onto the fact (no second fact shuffle); thresholds are ROUNDED
    on both engines before clipping so every comparison sees identical
    bits, and the winsorized sum goes through the decimal path.  Reports
    clip counts per side — the audit trail for how much the cap bit."""
    # Class-L discipline: thresholds, clip counts, and the winsorized sum
    # all run over IN-DOMAIN values (measure()); a NaN/Inf row is missing,
    # not clipped — the gate must wrap the WHOLE clip expression because
    # least/greatest SKIP nulls on both engines (a bare least(greatest(
    # NULL, lo), hi) would silently contribute lo per quarantined row).
    ev = load(spark, sf_dir, "events")
    mv = measure(F.col("value"))
    b = ev.groupBy("event_type").agg(
        F.round(F.expr(
            "percentile(CASE WHEN abs(value) < 1e21 THEN value END, 0.05)"),
            6).alias("lo"),
        F.round(F.expr(
            "percentile(CASE WHEN abs(value) < 1e21 THEN value END, 0.95)"),
            6).alias("hi"),
    )
    w = F.when(in_measure_domain(F.col("value")),
               F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count_if(mv < F.col("lo")).alias("n_clipped_low"),
            F.count_if(mv > F.col("hi")).alias("n_clipped_high"),
            dsum(w).alias("sum_winsorized"),
        )
    )


@query("q_agg_mode", oracle="""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id AS mode_user, CAST(n AS BIGINT) AS n_events
FROM c
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY n DESC, user_id) = 1
""")
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group (most frequent user per event type,
    ties to the lowest id).  Spark's built-in ``mode()`` breaks ties
    arbitrarily — useless under an exact oracle — so the argmax rides a
    ``min(struct(-n, user_id))``: minus-count ascending is count
    descending, and the struct order resolves ties deterministically.
    Two aggregates, both with map-side partials; the second shuffles one
    row per (type, user), not per event."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.groupBy("event_type")
        .agg(F.min(F.struct((-F.col("n")).alias("neg_n"),
                            F.col("user_id").alias("u"))).alias("m"))
        .select(
            "event_type",
            F.col("m.u").alias("mode_user"),
            (-F.col("m.neg_n")).cast("long").alias("n_events"),
        )
    )


@query("q_agg_observed", oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         AS n_purchase,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user,
       {dsum_sql('value')} AS sum_value
FROM events
""")
def q_agg_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation-API metrics: data-quality aggregates PIGGYBACKED on a
    pass that is already running (``df.observe(...)`` + an action), not a
    second scan.  At 100 TB this is the difference between free pipeline
    telemetry (row counts, domain bounds, conditional tallies collected by
    the same tasks that do the real work) and doubling the IO bill with a
    separate audit job; the identical call works on a streaming DataFrame,
    where the metrics surface per micro-batch in QueryProgress events.
    The observed pass here is a count() over the events scan; the metric
    values then round-trip through a 1-row DataFrame so the oracle checks
    them exactly (the decimal-path sum keeps the double bit-identical)."""
    from pyspark.sql import Observation

    obs = Observation("dq_metrics")
    ev = load(spark, sf_dir, "events")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .alias("n_purchase"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        dsum(F.col("value")).alias("sum_value"),
    )
    observed.count()  # the "real" pass the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_purchase"], m["min_user"], m["max_user"],
          m["sum_value"])],
        "n_rows long, n_purchase long, min_user long, max_user long, "
        "sum_value double",
    )


@query("q_agg_linreg", oracle="""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) AS DECIMAL(27,0)))
              AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) * value AS DECIMAL(27,2)))
              AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)
                       AS DECIMAL(27,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(value * value AS DECIMAL(27,2))) AS DOUBLE) AS syy
  FROM events WHERE abs(value) < 1e21 GROUP BY 1
)
SELECT event_type, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m
""")
def q_agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped simple linear regression (the regr_slope / regr_intercept
    / r² family) of value on user_id per event type — the trend-fitting
    aggregate BI dashboards and drift monitors lean on, computed from the
    five classical moment sums so it needs exactly ONE aggregation pass.

    Scale shape: one groupBy shuffle with map-side partials carrying six
    accumulators per group — the closed-form fit never re-scans and never
    sorts, and the same moment sums serve corr/covar/stddev for free.

    Determinism: every moment goes through the decimal path (products of
    doubles are single IEEE ops on identical bits, then exact decimal
    sums), so slope/intercept/r² are fixed-shape expressions over
    bit-identical operands — emitted raw, no round().  Decimal SCALES are
    per-moment (the SKILL.md 2^53 rule): Σx² is ~1.5e10 per group at
    sf0.1, which at the standard 6-dp scale is a ~2^54 scaled integer —
    past the exact decimal→double cast (the Gini one-ulp bug) — so the
    integral moments (x, x²) carry scale 0 and the value products (xy,
    y²) scale 2, keeping every scaled sum orders of magnitude inside
    2^53 at any plausible SF.

    Class-L policy: the regression runs over observed IN-DOMAIN (x, y)
    pairs (abs(value) < 1e21 both sides) so n and every moment count the
    SAME rows — a NaN/Inf measure is missing, and a per-moment gate
    alone would desynchronize n from the sums."""
    ev = load(spark, sf_dir, "events").filter(
        in_measure_domain(F.col("value")))
    x = F.col("user_id").cast("double")
    y = F.col("value")

    def dsum_s(col, scale):
        return F.sum(col.cast(f"decimal(27,{scale})")).cast("double")

    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum_s(x, 0).alias("sx"), dsum(y).alias("sy"),
        dsum_s(x * y, 2).alias("sxy"), dsum_s(x * x, 0).alias("sxx"),
        dsum_s(y * y, 2).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type", "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy))).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Weighted median — order statistic under a weight column.  percentile()
# treats every row equally; real pricing/mixture questions weight rows
# (here: the median sale price per return flag, weighted by quantity, i.e.
# "the price at which half the UNITS moved", not half the line items).
# ---------------------------------------------------------------------------

@query("q_agg_weighted_median", oracle="""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(27,6))) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cw,
         SUM(CAST(l_quantity AS DECIMAL(27,6))) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS wmedian,
       CAST(MAX(tw) AS DOUBLE) AS total_weight
FROM cum
WHERE 2 * cw >= tw
GROUP BY l_returnflag
""")
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower weighted median: the smallest price whose cumulative weight
    reaches half the group's total.  One shuffle (partitionBy the group
    key) feeding both windows, then a tiny groupBy-min.  Determinism:
    the running weight is summed in DECIMAL (associative — DuckDB's
    segment-tree window accumulation and Spark's row-at-a-time order
    then agree exactly; SKILL.md running-sum gotcha), the threshold is
    the integer-exact `2*cw >= tw` (no division), and the ORDER BY
    carries the unique (orderkey, linenumber) tiebreak.  The selected
    price is a raw input double — no float aggregation touches it.
    Null-measure policy (hostile class C2): the weighted median is over
    rows with BOTH measures observed — a NULL price would otherwise ride
    the engines' opposite null sort orders into every cumulative weight,
    and a NULL weight carries no information.

    At 100 TB a full per-group sort is the honest cost of an exact
    order statistic; the scale path is two-pass bracketing (approx
    percentile to find a narrow price bracket, exact pass inside it),
    which this formulation reduces to by adding one filter."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull())
    qdec = F.col("l_quantity").cast("decimal(27,6)")
    w_cum = (Window.partitionBy("l_returnflag")
             .orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
    w_all = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag", "l_extendedprice",
        F.sum(qdec).over(w_cum).alias("cw"),
        F.sum(qdec).over(w_all).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("wmedian"),
             F.max("tw").cast("double").alias("total_weight"))
    )


# ---------------------------------------------------------------------------
# Two-sample Welch t-test — the A/B experimentation primitive: compare the
# value distribution between two user cohorts per event type, from ONE
# grouped moment pass (no per-row Python, no second scan).
# ---------------------------------------------------------------------------

@query("q_agg_ab_ttest", oracle="""
WITH m AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE user_id % 2 = 0) AS nx,
         COUNT(*) FILTER (WHERE user_id % 2 = 1) AS ny,
         CAST(SUM(CAST(value AS DECIMAL(27,6)))
              FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(27,6)))
              FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS sy,
         CAST(SUM(CAST(value * value AS DECIMAL(27,4)))
              FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(value * value AS DECIMAL(27,4)))
              FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS syy
  FROM events WHERE abs(value) < 1e21 GROUP BY event_type
)
SELECT event_type,
       CAST(nx AS BIGINT) AS n_a, CAST(ny AS BIGINT) AS n_b,
       sx / nx AS mean_a, sy / ny AS mean_b,
       (sx / nx - sy / ny)
         / sqrt((sxx - sx * sx / nx) / (nx - 1) / nx
                + (syy - sy * sy / ny) / (ny - 1) / ny) AS t_stat
FROM m
""")
def q_agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between cohort A (even user_id) and B (odd) per event
    type.  One scan, one grouped aggregate carrying six conditional
    moments (map-side partials) — the scalable shape for any two-sample
    test at 100 TB.  Determinism: Σv and Σv² are exact decimal sums (v
    has 2 decimals, v² exactly 4 — scale 4 keeps the scaled Σv² integer
    well under 2^53 at sf0.1 where scale 6 would be within 1.5× of the
    bound); the t statistic itself is a fixed IEEE expression evaluated
    on those identical bits in both engines, emitted raw per the
    round-divergence rule (sx² needs >53 bits and rounds, but it rounds
    IDENTICALLY — exactness is only required of the aggregates, the
    post-aggregate scalar math just has to be the same op sequence).
    Class-L: cohort counts and moments run over in-domain values only
    (the linreg observed-domain policy)."""
    ev = load(spark, sf_dir, "events").filter(
        in_measure_domain(F.col("value")))
    a_row = F.col("user_id") % 2 == 0
    v = F.col("value")

    def cdsum(cond, col, scale):
        return F.sum(F.when(cond, col).cast(f"decimal(27,{scale})")) \
                .cast("double")

    m = ev.groupBy("event_type").agg(
        F.count(F.when(a_row, 1)).alias("nx"),
        F.count(F.when(~a_row, 1)).alias("ny"),
        cdsum(a_row, v, 6).alias("sx"), cdsum(~a_row, v, 6).alias("sy"),
        cdsum(a_row, v * v, 4).alias("sxx"),
        cdsum(~a_row, v * v, 4).alias("syy"),
    )
    nx, ny = F.col("nx"), F.col("ny")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy = F.col("sxx"), F.col("syy")
    mean_a, mean_b = sx / nx, sy / ny
    t = (mean_a - mean_b) / F.sqrt(
        (sxx - sx * sx / nx) / (nx - 1) / nx
        + (syy - sy * sy / ny) / (ny - 1) / ny)
    return m.select(
        "event_type",
        nx.cast("long").alias("n_a"), ny.cast("long").alias("n_b"),
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        t.alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Additive (empirical-Bayes) smoothing of per-user conversion rates toward
# the global prior — what a ranking UI should sort by instead of the raw
# rate (a 1/1 user must not outrank a 95/100 user).
# ---------------------------------------------------------------------------

BAYES_ALPHA = 20  # pseudo-events pulled toward the global prior


@query("q_agg_bayes_rate", oracle=f"""
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
              AS BIGINT) AS s
  FROM events GROUP BY 1
), g AS (
  SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) AS p0 FROM per_user
)
SELECT user_id, n, s,
       CAST(s AS DOUBLE) / n AS raw_rate,
       (s + {BAYES_ALPHA} * p0) / (n + {BAYES_ALPHA}) AS smoothed_rate,
       p0 AS prior
FROM per_user, g
""")
def q_agg_bayes_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase rate with additive smoothing toward the global
    prior: (s + α·p0) / (n + α), α = 20 pseudo-events.

    Determinism: counts are exact integers; p0 is ONE division of two
    exact integer sums (bit-identical); the smoothed rate is the same
    fixed IEEE chain in both engines over those identical bits — raw
    emit.  Plan: one scan into the user rollup (the only fact shuffle);
    the prior is a 1-row aggregate OF THE ROLLUP (no second scan)
    broadcast back — at 100 TB smoothing is free on top of the counts
    any rate report already needs."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("s"),
    )
    g = per_user.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("p0"))
    n, s, p0 = F.col("n"), F.col("s"), F.col("p0")
    return per_user.crossJoin(F.broadcast(g)).select(
        "user_id", n.cast("long").alias("n"), s.cast("long").alias("s"),
        (s.cast("double") / n).alias("raw_rate"),
        ((s + BAYES_ALPHA * p0) / (n + BAYES_ALPHA)).alias("smoothed_rate"),
        p0.alias("prior"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence — is order status independent of order
# priority?  The categorical-association primitive behind every feature-
# selection pass and A/B invariance check (SRM detection runs exactly this
# test on assignment counts).  Includes Cramér's V, the normalized effect
# size that makes the statistic comparable across tables.
# ---------------------------------------------------------------------------


@query("q_agg_chi2", oracle="""
WITH cells AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
), rt AS (
  SELECT s, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1
), ct AS (
  SELECT p, CAST(SUM(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT p) AS BIGINT) AS n_cols
  FROM cells
), terms AS (
  SELECT c.s, c.p, c.o, t.n, t.n_rows, t.n_cols,
         (c.o - CAST(r.row_tot * ct.col_tot AS DOUBLE) / t.n)
         * (c.o - CAST(r.row_tot * ct.col_tot AS DOUBLE) / t.n)
         / (CAST(r.row_tot * ct.col_tot AS DOUBLE) / t.n) AS term
  FROM cells c
  JOIN rt r USING (s) JOIN ct USING (p) CROSS JOIN tot t
), folded AS (
  -- class K: COALESCE the empty-input NULLs to 0 (no observations, no
  -- categories) so both engines report the same zero-observation row.
  SELECT COALESCE(MAX(n), 0) AS n,
         COALESCE(MAX(n_rows), 0) AS n_rows,
         COALESCE(MAX(n_cols), 0) AS n_cols,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(
             list_sort(list(struct_pack(s := s, p := p, term := term))),
             e -> e.term)),
           (a, x) -> a + x) AS chi2
  FROM terms
)
SELECT n, n_rows, n_cols,
       CAST(greatest(n_rows - 1, 0) * greatest(n_cols - 1, 0) AS BIGINT)
         AS dof,
       chi2,
       sqrt(chi2 / (n * least(n_rows - 1, n_cols - 1))) AS cramers_v
FROM folded
""")
def q_agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of o_orderstatus × o_orderpriority, with
    Cramér's V.

    Determinism: observed counts and marginals are exact integers from
    one contingency rollup; each cell's expected value is row_tot×col_tot
    (an exact ≤2^53 integer product) through ONE double division, so
    every (o-e)²/e term carries identical bits cross-engine, and the
    cell terms fold in (status, priority)-SORTED order via a JVM
    higher-order aggregate mirrored by list_reduce with a zero seed (a
    bare SUM over the term doubles would re-associate under shuffle).
    chi2 and Cramér's V are then the same fixed IEEE expressions on
    identical bits — raw emit.  Plan: ONE fact scan into the cell
    rollup; marginals come from windows OVER THE CELLS (a join-back
    formulation re-scans the fact table once per marginal — measured 4
    scans — while the window form re-reads 15 rows), and the
    SinglePartition stages only ever see the R×C cell table —
    category-domain-bounded, never data-bounded."""
    od = load(spark, sf_dir, "orders")
    # Explicit null-category policy: a NULL status/priority is not an
    # observed category — drop it from the contingency table on BOTH
    # sides.  (Without this the oracle's equi-joins on the category keys
    # silently drop NULL cells while the window marginals keep them —
    # divergent chi2 the moment the column has nulls; COUNT(DISTINCT)
    # already ignores nulls, so exclusion is the consistent test.)
    od = od.filter(F.col("o_orderstatus").isNotNull()
                   & F.col("o_orderpriority").isNotNull())
    cells = od.groupBy(F.col("o_orderstatus").alias("s"),
                       F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).alias("o"))
    w_row = Window.partitionBy("s")
    w_col = Window.partitionBy("p")
    w_all = Window.partitionBy()
    marg = cells.select(
        "s", "p", "o",
        F.sum("o").over(w_row).cast("long").alias("row_tot"),
        F.sum("o").over(w_col).cast("long").alias("col_tot"),
        F.sum("o").over(w_all).cast("long").alias("n"),
    )
    e = ((F.col("row_tot") * F.col("col_tot")).cast("double")
         / F.col("n"))
    terms = marg.select(
        "s", "p", "n",
        ((F.col("o") - e) * (F.col("o") - e) / e).alias("term"))
    folded = terms.agg(
        # class K: 0 observations, not NULL, when the table is empty
        # (mirrors the oracle's COALESCE; countDistinct is already 0).
        F.coalesce(F.max("n"), F.lit(0).cast("long")).alias("n"),
        F.countDistinct("s").cast("long").alias("n_rows"),
        F.countDistinct("p").cast("long").alias("n_cols"),
        F.aggregate(
            F.sort_array(F.collect_list(
                F.struct(F.col("s").alias("s"), F.col("p").alias("p"),
                         F.col("term").alias("term")))),
            F.lit(0.0),
            lambda acc, x: acc + x.getField("term"),
        ).alias("chi2"),
    )
    # class K / degenerate cardinality: dof clamps at 0 (the raw
    # (r-1)(c-1) is 1 for an empty table), and cramers_v rides
    # try_divide — a SINGLE-category dimension (r=1 or c=1, legal data)
    # makes the denominator n*least(r-1,c-1) zero, which ANSI division
    # would crash on while DuckDB's /0 yields NULL.
    return folded.select(
        "n", "n_rows", "n_cols",
        (F.greatest(F.col("n_rows") - 1, F.lit(0))
         * F.greatest(F.col("n_cols") - 1, F.lit(0))).cast("long")
        .alias("dof"),
        "chi2",
        F.sqrt(F.try_divide(
            F.col("chi2"),
            F.col("n") * F.least(F.col("n_rows") - 1,
                                 F.col("n_cols") - 1)))
        .alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA (fixed effects) — does mean order value differ ACROSS the
# five order priorities?  Completes the hypothesis-test panel: Welch-t
# (q_agg_ab_ttest) compares TWO means, Mann-Whitney compares two ranks,
# chi-square tests categorical independence — ANOVA is the k-group mean
# comparison, with eta-squared as its effect size.
# ---------------------------------------------------------------------------


@query("q_agg_anova", oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(27,6)))
              AS DOUBLE) AS q
  FROM orders WHERE abs(o_totalprice) < 1e21 GROUP BY 1
), packed AS (
  SELECT list_sort(list(struct_pack(grp := grp, n := n, s := s, q := q)))
           AS ls,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
), sums AS (
  SELECT ls, n_total, k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(ls, e -> e.s)), (a, x) -> a + x) AS s_all
  FROM packed
), parts AS (
  SELECT n_total, k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(ls, e ->
             CAST(e.n AS DOUBLE)
             * (e.s / e.n - s_all / n_total)
             * (e.s / e.n - s_all / n_total))),
           (a, x) -> a + x) AS ssb,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(ls, e -> e.q - e.s * e.s / e.n)),
           (a, x) -> a + x) AS ssw
  FROM sums
)
SELECT n_total, k,
       round((ssb / (k - 1)) / (ssw / (n_total - k)), 9) + 0.0 AS f_stat,
       round(ssb / (ssb + ssw), 12) + 0.0 AS eta_sq
FROM parts
""")
def q_agg_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of o_totalprice across order priorities.

    Determinism: per-group Σy and Σy² ride the exact decimal path (2-dp
    money: y² carries 4 decimal digits — exact at scale 6 per the
    product-of-2dp rule), counts are integers, and every cross-group
    reduction (grand sum, between/within sums of squares) folds the
    ≤k group structs in GROUP-SORTED order via a JVM higher-order
    aggregate mirrored by list_reduce with a zero seed — a bare SUM over
    those doubles would re-associate under shuffle.  Σy² exceeds the
    2^53 exact-cast window (3e14 × 10^6 scale at sf0.01 — the Gini
    magnitude gotcha), so its decimal→double cast legitimately rounds
    and the engines diverge by one ulp (measured on ssw); the raw sums
    of squares are therefore NOT emitted — only the scale-free F and
    eta² ratios, rounded on both sides per the HHI wide-decimal
    discipline (9/12 dp keep 7+ sig figs at their O(1)/O(1e-4)
    magnitudes while sitting far above the ulp).  Plan: one
    fact scan into the per-priority rollup (partial-aggregated), then a
    1-row fold over k=5 structs — the SinglePartition stage merges k
    rows, nothing more; the cheapest possible k-group test shape at any
    corpus size.  Class-L: observed-in-domain money only (the linreg
    policy — n and moments must count the same rows)."""
    od = load(spark, sf_dir, "orders").filter(
        in_measure_domain(F.col("o_totalprice")))
    y = F.col("o_totalprice")
    g = od.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(y).alias("s"),
        F.sum((y * y).cast("decimal(27,6)")).cast("double").alias("q"),
    )
    packed = g.agg(
        F.sort_array(F.collect_list(
            F.struct("grp", "n", "s", "q"))).alias("ls"),
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    fsum = lambda expr: F.aggregate(  # noqa: E731
        F.col("ls"), F.lit(0.0), lambda acc, e: acc + expr(e))
    sums = packed.select(
        "ls", "n_total", "k",
        fsum(lambda e: e.getField("s")).alias("s_all"),
    )
    mean_dev = lambda e: (e.getField("s") / e.getField("n")  # noqa: E731
                          - F.col("s_all") / F.col("n_total"))
    parts = sums.select(
        "n_total", "k",
        fsum(lambda e: e.getField("n").cast("double")
             * mean_dev(e) * mean_dev(e)).alias("ssb"),
        fsum(lambda e: e.getField("q")
             - e.getField("s") * e.getField("s") / e.getField("n"))
        .alias("ssw"),
    )
    # class K / degenerate cardinality: every division rides try_divide
    # (NULL on a zero divisor, mirroring DuckDB's /0 -> NULL) — k=1
    # (single group: k-1 = 0), ssw=0 (constant values within groups:
    # ssb+ssw can be 0), and the empty table (ssb+ssw = 0.0) are all
    # reachable shapes where ANSI division would crash instead.
    return parts.select(
        "n_total", "k",
        (F.round(F.try_divide(
            F.try_divide(F.col("ssb"), F.col("k") - 1),
            F.try_divide(F.col("ssw"),
                         F.col("n_total") - F.col("k"))), 9)
         + 0.0).alias("f_stat"),
        (F.round(F.try_divide(F.col("ssb"),
                              F.col("ssb") + F.col("ssw")), 12) + 0.0)
        .alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Skewness / kurtosis — the 3rd/4th standardized moments q_agg_stats
# stops short of: tail-asymmetry and tail-weight per event type, the
# distribution-shape numbers a drift monitor tracks beyond mean/variance.
# ---------------------------------------------------------------------------


@query("q_agg_skew_kurtosis", oracle="""
WITH s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(value * value * value AS DECIMAL(38,6)))
              AS DOUBLE) AS s3,
         CAST(SUM(CAST(value * value * value * value AS DECIMAL(38,8)))
              AS DOUBLE) AS s4
  FROM events WHERE abs(value) < 1e21 GROUP BY 1
), m AS (
  SELECT event_type, n,
         s1 / n AS mu, s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
  FROM s
), c AS (
  SELECT event_type, n,
         r2 - mu * mu AS m2,
         r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
         r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
           AS m4
  FROM m
)
SELECT event_type, n,
       round(m3 / (m2 * sqrt(m2)), 9) + 0.0 AS skewness,
       round(m4 / (m2 * m2) - 3, 9) + 0.0 AS excess_kurtosis
FROM c
""")
def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of value per event type,
    from one pass of exact power sums.

    Determinism: y is 2-dp so y², y³ carry 4/6 decimal digits (exact at
    scale 6) and y⁴ carries 8 (its own DECIMAL(38,8) accumulator — the
    scale-6 cast would round, the cross-corr product rule); the sums
    are order-independent decimals.  Their double casts can exceed the
    2^53 window at scale (the ANOVA lesson), so only the SCALE-FREE
    standardized ratios are emitted, rounded at 9 dp with the -0.0
    guard (skewness crosses zero on near-symmetric types).  The central
    moments expand in raw-moment form with identical association on
    both sides.  Plan: one scan, one partial-aggregated rollup — the
    q_agg_stats shape with two more accumulators.  Class-L:
    observed-in-domain values only (the linreg policy)."""
    ev = load(spark, sf_dir, "events").filter(
        in_measure_domain(F.col("value")))
    y = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y.cast("decimal(27,6)")).cast("double").alias("s1"),
        F.sum((y * y).cast("decimal(27,6)")).cast("double").alias("s2"),
        F.sum((y * y * y).cast("decimal(38,6)")).cast("double")
        .alias("s3"),
        F.sum((y * y * y * y).cast("decimal(38,8)")).cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    r2, r3, r4 = F.col("s2") / n, F.col("s3") / n, F.col("s4") / n
    m = s.select(
        "event_type", "n", mu.alias("mu"), r2.alias("r2"),
        r3.alias("r3"), r4.alias("r4"))
    mu, r2, r3, r4 = (F.col(c) for c in ("mu", "r2", "r3", "r4"))
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    c = m.select("event_type", "n", m2.alias("m2"), m3.alias("m3"),
                 m4.alias("m4"))
    return c.select(
        "event_type", "n",
        (F.round(F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))), 9)
         + 0.0).alias("skewness"),
        (F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3, 9)
         + 0.0).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation — the monotone-association sibling of
# q_agg_stats' Pearson corr: rank both variables (average ranks over ties),
# then correlate the ranks.  Robust to the value scale and to outliers, and
# the standard drift check between two score columns in a data pipeline.
# ---------------------------------------------------------------------------


@query("q_agg_spearman", oracle="""
WITH ranked AS (
  SELECT l_returnflag AS rf,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
           + COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_discount
                            RANGE BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS rx2,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                            RANGE BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS ry2
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
), centered AS (
  SELECT rf, n, rx2 - (n + 1) AS cx, ry2 - (n + 1) AS cy FROM ranked
), sums AS (
  SELECT rf, CAST(MAX(n) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(cx * cy AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(cx * cx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(cy * cy AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM centered GROUP BY rf
)
SELECT rf, n_rows, round(sxy / sqrt(sxx * syy), 9) + 0.0 AS rho_s
FROM sums
""")
def q_agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between discount and quantity per
    return flag, with exact average-rank tie handling.

    Rank trick: the tie-averaged rank doubled is an INTEGER —
    ``2·avg_rank = rank_min + rank_max`` where rank_min is ``rank()``
    and rank_max is the peer-inclusive cumulative count (a RANGE-frame
    COUNT over the same ordering, so it rides the same sort).  Centering
    by ``n+1`` makes the doubled ranks sum to zero algebraically, so
    rho reduces to Σcxcy / √(Σcx²·Σcy²) over integers.

    Determinism: all three sums are exact DECIMAL(38,0) (the ANSI
    long-overflow gotcha rules out raw BIGINT sums at replication
    scale); their double casts can round above 2^53, so the final
    scale-free ratio is rounded at 9 dp with the -0.0 guard — the HHI
    discipline.  Ranks over doubles are tie-exact because the fixture
    values carry 2 decimal digits (exact doubles).  Null-measure policy
    (hostile class C2): pairwise deletion — only rows with BOTH measures
    observed enter the ranking (a NULL would rank first in Spark and
    last in DuckDB, shifting every centered rank).

    Plan: one scan, ONE exchange on l_returnflag — both rank windows
    and the peer-count frames ride the same hash partitioning (two
    in-partition sorts), and the final rollup reuses it."""
    li = load(spark, sf_dir, "lineitem")
    w_x = Window.partitionBy("l_returnflag").orderBy("l_discount")
    w_xc = w_x.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    w_y = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    w_yc = w_y.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    li = li.filter(F.col("l_discount").isNotNull()
                   & F.col("l_quantity").isNotNull())
    w_n = Window.partitionBy("l_returnflag")
    # Keep the UN-aliased key through the rollup: grouping on a renamed
    # column would hide the window partitioning from Catalyst and cost a
    # second (tiny but pointless) exchange — alias to rf only at the end.
    ranked = li.select(
        "l_returnflag",
        F.count(F.lit(1)).over(w_n).alias("n"),
        (F.rank().over(w_x) + F.count(F.lit(1)).over(w_xc)).alias("rx2"),
        (F.rank().over(w_y) + F.count(F.lit(1)).over(w_yc)).alias("ry2"),
    )
    cx = F.col("rx2") - (F.col("n") + 1)
    cy = F.col("ry2") - (F.col("n") + 1)
    centered = ranked.select("l_returnflag", "n",
                             cx.alias("cx"), cy.alias("cy"))
    sums = centered.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n_rows"),
        F.sum((F.col("cx") * F.col("cy")).cast("decimal(38,0)"))
        .cast("double").alias("sxy"),
        F.sum((F.col("cx") * F.col("cx")).cast("decimal(38,0)"))
        .cast("double").alias("sxx"),
        F.sum((F.col("cy") * F.col("cy")).cast("decimal(38,0)"))
        .cast("double").alias("syy"),
    )
    return sums.select(
        F.col("l_returnflag").alias("rf"), "n_rows",
        (F.round(F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy")), 9)
         + 0.0).alias("rho_s"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates — BIT_OR / BIT_AND / BIT_XOR as AGGREGATES (the scalar
# bitwise family is q_fn_bitwise): per-user action masks, the compact
# "which event kinds has this user ever/oddly-often produced" encoding a
# feature store keeps as one integer instead of five booleans.
# ---------------------------------------------------------------------------

_ACTION_BIT_SQL = ("CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
                   "WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 "
                   "ELSE 16 END")


@query("q_agg_bitwise_agg", oracle=f"""
WITH b AS (
  SELECT user_id, event_type, {_ACTION_BIT_SQL} AS bit FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(bit_or(bit) AS BIGINT) AS ever_mask,
       CAST(bit_xor(bit) AS BIGINT) AS parity_mask,
       CAST(bit_and(xor(31, bit)) AS BIGINT) AS never_mask,
       CAST(bit_count(bit_or(bit)) AS BIGINT) AS n_kinds,
       CAST(bit_count(bit_or(bit)) AS BIGINT)
         = CAST(COUNT(DISTINCT event_type) AS BIGINT) AS mask_consistent
FROM b GROUP BY user_id
""")
def q_agg_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family over per-user action-bit masks:
    ever_mask = BIT_OR (the user's capability set), parity_mask =
    BIT_XOR (bits whose action occurred an ODD number of times — the
    order-independent parity check), never_mask = BIT_AND of the
    5-bit complements (actions in NO event; algebraically 31 XOR
    ever_mask — asserted as a property), and n_kinds = BIT_COUNT of
    the OR, cross-checked in-row against COUNT(DISTINCT event_type).

    Determinism: bitwise AND/OR/XOR are associative and commutative,
    so all three aggregates are shuffle-order-exact integers — no
    decimal path, no rounding, raw emit throughout.

    Plan: one scan, one partial-aggregated user rollup (bitwise
    partials combine map-side like sums — the whole point of mask
    encodings at scale)."""
    ev = load(spark, sf_dir, "events")
    bit = (F.when(F.col("event_type") == "view", 1)
           .when(F.col("event_type") == "click", 2)
           .when(F.col("event_type") == "purchase", 4)
           .when(F.col("event_type") == "signup", 8)
           .otherwise(16))
    b = ev.select("user_id", "event_type", bit.alias("bit"))
    ever = F.bit_or("bit")
    agg = b.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        ever.cast("long").alias("ever_mask"),
        F.bit_xor("bit").cast("long").alias("parity_mask"),
        F.bit_and(F.lit(31).bitwiseXOR(F.col("bit"))).cast("long")
        .alias("never_mask"),
        F.bit_count(ever).cast("long").alias("n_kinds"),
        (F.bit_count(ever).cast("long")
         == F.countDistinct("event_type").cast("long"))
        .alias("mask_consistent"),
    )
    return agg


# ---------------------------------------------------------------------------
# Equi-DEPTH histogram — the quantile-bucket companion of q_ts_histogram's
# fixed-width bins: 8 buckets holding (near-)equal row counts, the summary
# an optimizer's statistics collector and a monitoring dashboard both keep.
# Exact, without any global sort of the data: depth boundaries come from
# the VALUE-DOMAIN histogram (the curriculum-tercile discipline at B=8).
# ---------------------------------------------------------------------------

EQUIDEPTH_BUCKETS = 8


@query("q_agg_equidepth_hist", oracle=f"""
WITH v AS (
  -- observed-measure policy (class C), tightened to the cents-domain by
  -- class L: a NULL cents group would ride the engines' opposite null
  -- sort orders into the prefix sum, and a NaN/Inf/1e22 value crashes
  -- the cents cast on both engines.  The bound is this query's OWN
  -- representation limit (cents must fit DECIMAL(18,2)), stricter than
  -- the global 1e21 measure domain.
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events WHERE abs(value) < 1e16
), hist AS (
  SELECT c, COUNT(*) AS n FROM v GROUP BY c
), cum AS (
  SELECT c, n,
         COALESCE(SUM(n) OVER (ORDER BY c
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS cb,
         SUM(n) OVER () AS t
  FROM hist
)
SELECT CAST(({EQUIDEPTH_BUCKETS} * cb) // t AS BIGINT) AS bucket,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MIN(c) AS BIGINT) AS lo_cents,
       CAST(MAX(c) AS BIGINT) AS hi_cents,
       CAST(COUNT(*) AS BIGINT) AS n_distinct
FROM cum GROUP BY 1
""")
def q_agg_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of event values in 8 buckets.

    Exactness and scale in one move: bucket boundaries are an exclusive
    prefix sum over the DISTINCT-CENTS histogram — bounded by the value
    domain (≤10⁴ distinct 2-dp values), never by the corpus — so no
    global sort or ntile touches the fact table, ties always share a
    bucket (deterministic under any partitioning), and every output is
    an integer (values carried as cents).  Bucket id uses the
    truncating-division pair (Spark cast-long ≡ DuckDB `//`+CAST on
    nonnegative operands).

    Plan: one scan → one cents rollup shuffle; the prefix windows run
    over the tiny histogram; the bucket rollup is 8 rows."""
    ev = load(spark, sf_dir, "events").filter(
        F.abs(F.col("value")) < F.lit(1e16))  # cents-domain (see oracle)
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    hist = ev.select(c.alias("c")).groupBy("c").agg(
        F.count(F.lit(1)).alias("n"))
    w_cum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    cum = hist.select(
        "c", "n",
        F.coalesce(F.sum("n").over(w_cum), F.lit(0)).alias("cb"),
        F.sum("n").over(w_all).alias("t"),
    )
    bucket = (F.lit(EQUIDEPTH_BUCKETS) * F.col("cb") / F.col("t")) \
        .cast("long")
    return cum.groupBy(bucket.alias("bucket")).agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.min("c").cast("long").alias("lo_cents"),
        F.max("c").cast("long").alias("hi_cents"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
