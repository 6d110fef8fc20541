"""Container log-line source (SURVEY.md §2.1 row 4).

The reference attaches to each container's stdout/stderr with
``logs(stream=True, follow=True, timestamps=True)`` and parses the leading
RFC3339 timestamp off every line [pub:muswarmlogger/loggers/docker.py].
Spark-first: a text source (one directory per container in production;
``input_file_name`` recovers the container id) parsed with one
regexp_extract pass — Catalyst-native, whole-stage codegen, no Python.

Line format (Docker's timestamped multiplexed log stream):
    2024-01-05T12:34:56.000000Z stdout some message text
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import query
from ..core.tables import load

_LINE_RE = r"^(\S+) (stdout|stderr) (.*)$"


def container_logs_text_dir(spark: SparkSession, sf_dir: str) -> str:
    """Synthesize the raw log stream from the events table (deterministic:
    error events → stderr, everything else → stdout)."""
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_container_logs_" + sf_dir.strip("/").replace("/", "_"),
    )
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    # no marker → any existing dir is a partial write from a crashed run
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + ".tmp", ignore_errors=True)
    ev = load(spark, sf_dir, "events")
    line = F.concat_ws(
        " ",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        F.when(F.col("event_type") == "error", "stderr").otherwise("stdout"),
        F.concat(F.lit("evt="), F.col("event_id").cast("string"),
                 F.lit(" type="), F.col("event_type"),
                 F.lit(" value="), F.col("value").cast("string")),
    )
    ev.select(line.alias("value")).coalesce(4).write.mode("overwrite").text(
        out + ".tmp"
    )
    os.rename(out + ".tmp", out)
    open(marker, "w").close()
    return out


def parse_log_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """One-regexp parse of the Docker log-line format (row 4's core
    transform).  Returns (ts timestamp, stream, message)."""
    v = F.col(value_col)
    return raw.select(
        F.to_timestamp(
            F.regexp_extract(v, _LINE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        ).alias("ts"),
        F.regexp_extract(v, _LINE_RE, 2).alias("stream"),
        F.regexp_extract(v, _LINE_RE, 3).alias("message"),
    )


def read_container_logs(spark: SparkSession, sf_dir: str,
                        streaming: bool = False) -> DataFrame:
    path = container_logs_text_dir(spark, sf_dir)
    reader = spark.readStream if streaming else spark.read
    return parse_log_lines(reader.text(path))


@query("q_source_container_logs", oracle="""
SELECT
  CASE WHEN event_type = 'error' THEN 'stderr' ELSE 'stdout' END AS stream,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
  COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN message LIKE '%type=purchase%' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_purchase_lines
FROM (
  SELECT event_type, ts,
         'evt=' || CAST(event_id AS VARCHAR) || ' type=' || event_type
           || ' value=' || CAST(value AS VARCHAR) AS message
  FROM events
)
GROUP BY 1
""")
def q_source_container_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row 4 end-to-end: raw text → regexp timestamp/stream/message parse →
    per-stream aggregate.  The oracle rebuilds the same lines relationally,
    value-checking the parser (incl. the RFC3339 round-trip the reference
    does per line [pub:muswarmlogger/loggers/docker.py])."""
    logs = read_container_logs(spark, sf_dir)
    return logs.groupBy("stream").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("message").like("%type=purchase%"), 1).otherwise(0))
        .alias("n_purchase_lines"),
    )
