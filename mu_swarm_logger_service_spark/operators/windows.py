"""Window functions — SURVEY.md §2.5 rows 36-41.

The reference's downstream dashboards order log lines per container and show
the most recent k (``ORDER BY dct:created`` per container in SwarmUI's SPARQL
[pub:SwarmUI queries]); window functions are the engine-side generalization.

Determinism discipline: every ORDER BY inside a window carries a unique
tiebreaker (``event_id`` / primary key) so rank/lag/frame results are
reproducible across engines and shuffle orders.

Scale: one window = one shuffle on the partition key + per-partition sort.
All windows here partition by a high-cardinality key (user_id, group key) —
no global (unpartitioned) windows, which would serialize 100 TB through a
single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.numeric import epoch_s, measure, measure_sql
from ..core.registry import query
from ..core.tables import load, observed_time


@query("q_win_rank", oracle="""
SELECT event_id, user_id,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per user timeline (row 36)."""
    ev = observed_time(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query("q_win_lag_lead", oracle="""
SELECT event_id, user_id,
       lag(event_id)  OVER w AS prev_event,
       lead(event_id) OVER w AS next_event,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap seconds (row 37) — the sessionization
    primitive (row 60 builds on this exact shape)."""
    ev = observed_time(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        (epoch_s("ts") - epoch_s(F.lag("ts").over(w)))
        .alias("gap_s"),
    )


@query("q_win_frame_rows", oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(({measure_sql('value')}) AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       CAST(SUM(CAST(({measure_sql('value')}) AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS sliding_value_4
FROM events WHERE ts IS NOT NULL
""")
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + sliding ROWS-frame sums (row 38).  Decimal-cast inside the
    frame so partial sums are order-exact vs the oracle; measure() carries
    dsum's class-L domain gate into the frame (one NaN row would crash
    the cast on both engines)."""
    ev = observed_time(load(spark, sf_dir, "events"))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = base.rowsBetween(-3, Window.currentRow)
    v = measure(F.col("value")).cast("decimal(27,6)")
    return ev.select(
        "event_id", "user_id",
        F.sum(v).over(running).cast("double").alias("running_value"),
        F.sum(v).over(sliding).cast("double").alias("sliding_value_4"),
    )


@query("q_win_frame_range", oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS n_last_hour
FROM events WHERE ts IS NOT NULL
""")
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time (row 39): events in the trailing hour,
    value-based so same-timestamp rows share a frame (no tiebreak needed —
    RANGE frames are peer-inclusive by definition)."""
    ev = observed_time(load(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@query("q_win_analytic", oracle="""
SELECT event_id, user_id,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       first_value(event_id) OVER w AS first_event,
       last_value(event_id)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_event
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first / last (row 40).
    last_value needs the full-partition frame in both engines (default frame
    stops at CURRENT ROW)."""
    ev = observed_time(load(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id", "user_id",
        F.ntile(4).over(w).alias("quartile"),
        # RAW quotients: percent_rank=(rank-1)/(n-1) and cume_dist=k/n are
        # single IEEE divisions of identical exact integers — bit-exact
        # cross-engine.  round(·, 6) was the only divergence source: at 8×
        # replication a quotient's shortest repr can terminate at the tie
        # digit (51250/800000 = .0640625) where Spark's HALF_UP on the
        # repr string and DuckDB's binary HALF-EVEN disagree.
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(full).alias("last_event"),
    )


@query("q_win_topk_group", oracle="""
SELECT user_id, event_id, ts, event_type
FROM events WHERE ts IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) <= 10
""")
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (row 41) — "last 10 log lines per container", the
    reference stack's core dashboard query [pub:SwarmUI], generalized.

    row_number + filter compiles to a single shuffle on user_id with a
    rank-limit pushdown (Spark's WindowGroupLimit takes only k rows per key
    per partition before the shuffle) — scales to any group count.
    """
    # ts is the AXIS here (the ranking coordinate), so the class-I
    # observed-time policy applies on both sides: an unstamped line has no
    # position on the "last 10" axis.  Without the filter, a user with <10
    # stamped rows pads the tail with null-ts rows (r11 ADVICE) — the
    # NULLS LAST pin made that parity-stable but policy-inconsistent.
    ev = observed_time(load(spark, sf_dir, "events"))
    # Explicit null placement retained: a rank-limited rowset must not
    # ride ordering defaults (the q_sort_multi lesson), even now that the
    # axis filter makes NULLS LAST vacuous for ts.
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query("q_win_time_range", oracle=f"""
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(SUM(CAST(({measure_sql('value')}) AS DECIMAL(27,6))) OVER w
            AS DOUBLE) AS sum_last_hour
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""")
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the count/sum of activity in
    the trailing hour of EVENT time (not row count) — the moving-window
    rate every log dashboard draws.  The frame is anchored on WHOLE epoch
    seconds on both sides via the sign-safe floor pair (core.numeric
    epoch_s ↔ the oracle's floor(epoch)): fractional-epoch skew flips
    frame membership at sf0.1 density, and trunc-vs-floor flips it on
    pre-epoch stamps (class H).  Rows with equal anchors
    share a frame (RANGE semantics).  Decimal-cast sum keeps the frame
    aggregate shuffle-order-proof."""
    ev = observed_time(load(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(measure(F.col("value")).cast("decimal(27,6)")).over(w)
        .cast("double").alias("sum_last_hour"),
    )
