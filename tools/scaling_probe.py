#!/usr/bin/env python
"""Replication scaling probe: warm walls for the 8 probe queries across
fixture scales (SCALE.md "Replication scaling probe").

Runs each query twice per scale and reports the SECOND (warm) wall, same
protocol as round 7, but measures all scales in ONE session so the
numbers are same-JVM comparable.  near-dedup stays excluded by design
(replicas differ by one appended token, which keeps cross-replica
Jaccard above the 0.5 threshold, so its pair count would grow
quadratically as a replication artifact, not a finding).

Usage: python tools/scaling_probe.py [dir1 dir2 ...]
       default: /root/testdata/sf0.1 /tmp/sfx4 /tmp/sfx8
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

QUERIES = [
    "q_agg_groupby", "q_join_sortmerge", "q_llm_exact_dedup",
    "q_sketch_kmv", "q_ts_anomaly", "q_llm_pagerank",
    "q_llm_ann_ivf", "q_llm_cosine_topk",
]

DIRS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfx4", "/tmp/sfx8"]


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    qs = entrymod.queries()
    out = {}
    for d in DIRS:
        out[d] = {}
        for name in QUERIES:
            fn = qs[name]
            walls = []
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, d).count()
                walls.append(time.time() - t0)
            out[d][name] = {"warm": round(walls[1], 3), "rows": n,
                            "cold": round(walls[0], 3)}
            print(f"{d} {name}: warm {walls[1]:.2f}s "
                  f"(cold {walls[0]:.2f}s, {n} rows)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
