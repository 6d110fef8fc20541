"""Table loaders for the driver-generated testdata (TESTDATA.md, FIXTURES.md).

At 100 TB these reads become partitioned-directory scans; the loader keeps a
single entry point so partition-pruning columns / bucketing specs can be
added without touching query code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (they scale with
# sf but stay orders of magnitude below the facts — classic star schema).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md) which Spark 4
        # rejects outright; read nanos as long and truncate to µs — exactly
        # what DuckDB's ns→µs view cast does, so the oracle agrees.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
