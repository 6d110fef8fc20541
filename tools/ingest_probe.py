#!/usr/bin/env python
"""Ingest-rate root-cause probe (r7 verdict task 3).

The headline bench ingest slid 95.2k (r6) -> 79.2k ev/s (r7, -17%), two
consecutive declining rounds.  This probe isolates the ingest path on an
idle box and answers:

  1. does ``stream_events(repartition_to=8)`` still take effect (task count
     per micro-batch == 8 after the repartition)?
  2. what does the rate look like across repartition_to in {None, 4, 8, 16}
     at 3 reps each (rep protocol identical to bench._measure_ingest)?

Run:  python tools/ingest_probe.py [sf_dir]    (default /root/testdata/sf0.1)
Prints one JSON line per variant; paste the table into SCALE.md.
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from mu_swarm_logger_service_spark import get_spark  # noqa: E402
from mu_swarm_logger_service_spark.core.tables import load  # noqa: E402
from mu_swarm_logger_service_spark.sources.triples import events_to_triples  # noqa: E402
from mu_swarm_logger_service_spark.streaming.transforms import stream_events  # noqa: E402


def run_variant(spark, n_events, repartition_to, reps=3):
    rates = []
    for _rep in range(reps):
        sink = tempfile.mkdtemp(prefix="probe_ingest_sink_")
        ckpt = tempfile.mkdtemp(prefix="probe_ingest_ckpt_")

        def write_batch(bdf, batch_id, sink=sink):
            bdf.write.mode("overwrite").parquet(
                os.path.join(sink, f"batch={batch_id}"))

        t0 = time.perf_counter()
        q = (
            events_to_triples(
                stream_events(spark, SF_DIR, repartition_to=repartition_to))
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        rates.append(round(n_events / dt, 1))
    return rates


def main():
    spark = get_spark()
    n_events = load(spark, SF_DIR, "events").count()

    # Question 1: partition count actually produced by the repartition —
    # read it off a foreachBatch batch (the stream plan's own view).
    seen = {}

    def check_batch(bdf, _bid):
        seen["parts"] = bdf.rdd.getNumPartitions()

    ckpt = tempfile.mkdtemp(prefix="probe_ingest_chk_")
    q = (
        stream_events(spark, SF_DIR, repartition_to=8)
        .writeStream.foreachBatch(check_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    print(json.dumps({"check": "repartition_effective",
                      "batch_partitions": seen.get("parts")}))

    # Warm the streaming engine once (cold rep tax measured separately by
    # the bench's own 3-rep protocol; here every variant gets the same
    # already-warm session so the comparison is apples-to-apples).
    run_variant(spark, n_events, 8, reps=1)

    for rp in (None, 4, 8, 16):
        rates = run_variant(spark, n_events, rp)
        print(json.dumps({"repartition_to": rp, "rates_events_per_sec": rates,
                          "rep2": rates[1], "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
