"""SparkSession factory tuned for this engine.

The reference (`big-data-europe/mu-swarm-logger-service`, see SURVEY.md §0)
is a single-process asyncio service; our engine replaces it with Spark, so
session configuration is where its "deployment knobs" live instead of env
vars like ``MU_SPARQL_ENDPOINT`` (SURVEY.md §3.1).

Scale posture (SURVEY.md §7 M6): AQE on with skew-join handling, shuffle
partitions sized for the local harness but overridable for a real cluster,
Arrow enabled for every pandas-UDF boundary, UTC session time zone so
timestamp semantics match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "mu-swarm-logger-spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster every conf here still applies; only ``master`` changes
    (submitted externally). ``local[N]`` is used when no master is set.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # AQE: runtime re-planning — partition coalescing, skew-join
        # splitting, SMJ→broadcast conversion (SURVEY.md §4.2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDF / toPandas boundaries (SNIPPETS.md pattern).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet: vectorized reader + pushdown are defaults; pin anyway so
        # a misconfigured site can't silently lose them.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # ANSI off: SPARQL-style queries expect permissive casts/NULLs.
        .config("spark.sql.ansi.enabled", "false")
        # Partition-file sizing for the 100 TB posture: 128 MiB splits.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if not os.environ.get("SPARK_MASTER") and "SPARK_GRAFT_LOCAL" not in os.environ:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
