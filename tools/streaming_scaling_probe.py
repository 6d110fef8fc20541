#!/usr/bin/env python
"""Replication scaling probe for the STREAMING stateful twins (r11
verdict task 5: tools/scaling_probe.py measures batch queries only,
while the burstiness/HW/MG/counters folds carry per-key state whose
O(1)-per-key claims had no measured evidence).

For each scale dir the events table is split into 4 ts-ordered files and
replayed (maxFilesPerTrigger=1) through every applyInPandasWithState op;
the probe records

- total wall and per-batch wall (query.recentProgress batchDuration),
- the state store's OWN row count (stateOperators[].numRowsTotal — not
  an output-derived proxy), max over batches,
- output rows.

Replication multiplies events per user but NOT users (gen_replicated.py
keeps user_id untouched), so the O(1)-state-per-key claim predicts:
state rows FLAT across x1/x4/x8 while wall grows ~linearly with rows.

Usage: python tools/streaming_scaling_probe.py [dir1 dir2 ...]
       default: /root/testdata/sf0.1 /tmp/sfx4 /tmp/sfx8
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfx4", "/tmp/sfx8"]
N_FILES = 4


def _split_events(spark, sf_dir):
    """events -> 4 ts-ordered parquet files for ordered replay (the
    tests/test_streaming.py recipe, Spark-side to survive 800k rows)."""
    from mu_swarm_logger_service_spark.core.tables import load

    out = tempfile.mkdtemp(prefix="sprobe_src_")
    ev = load(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows = ev.count()
    pdf = ev.toPandas()
    per = rows // N_FILES + 1
    for i in range(N_FILES):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk, schema=ev.schema).coalesce(1) \
                .write.mode("overwrite").parquet(
                    os.path.join(out, f"f{i:03d}"))
            time.sleep(1.05)  # file source orders batches by mtime
    return out, ev.schema, rows


def _run(spark, df, mode):
    """Run to the noop sink with AvailableNow; return (wall, progresses)."""
    ckpt = tempfile.mkdtemp(prefix="sprobe_ckpt_")
    t0 = time.time()
    q = (df.writeStream.format("noop").outputMode(mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    shutil.rmtree(ckpt, ignore_errors=True)
    return wall, prog


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from mu_swarm_logger_service_spark.streaming.stateful import (
        burstiness_stateful,
        holt_stateful,
        hw_stateful,
        mg_sketch_stateful,
        pattern_stateful,
        running_user_counters_stateful,
    )

    OPS = [
        ("counters", running_user_counters_stateful, "append"),
        ("burstiness", burstiness_stateful, "update"),
        ("mg_heavy_hitters", mg_sketch_stateful, "update"),
        ("holt", holt_stateful, "update"),
        ("holt_winters", hw_stateful, "update"),
        ("pattern_match", pattern_stateful, "update"),
    ]
    out = {}
    for d in DIRS:
        src, schema, n_rows = _split_events(spark, d)
        out[d] = {"events": n_rows}
        try:
            for name, fn, mode in OPS:
                stream = (spark.readStream.schema(schema)
                          .option("maxFilesPerTrigger", 1)
                          .parquet(os.path.join(src, "f*")))
                wall, prog = _run(spark, fn(stream), mode)
                batches = [p for p in prog if p.get("numInputRows", 0) > 0
                           or p.get("batchId", -1) >= 0]
                state_rows = max(
                    (so.get("numRowsTotal", 0)
                     for p in batches for so in p.get("stateOperators", [])),
                    default=0)
                per_batch = [round(p["batchDuration"] / 1000.0, 2)
                             for p in batches if "batchDuration" in p]
                out[d][name] = {
                    "wall": round(wall, 2),
                    "state_rows": state_rows,
                    "per_batch": per_batch,
                }
                print(f"{d} {name}: wall {wall:.2f}s state_rows "
                      f"{state_rows} per_batch {per_batch}", flush=True)
        finally:
            shutil.rmtree(src, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
