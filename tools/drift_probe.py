#!/usr/bin/env python
"""Isolated 3-rep measurement of the r7 drift watch list (verdict task 4).

r7 recorded +11-30% rep3 drift vs r6 on four pinned-plan queries that were
NOT touched in round 7: q_analytics_product_profit,
q_analytics_blocking_supplier, q_llm_pagerank, q_sparql_path.  Because the
full bench interleaves 24 queries, drift there can be crosstalk (GC debt,
shuffle-file accumulation, page cache) rather than a plan property.  This
probe runs ONLY the four, each in its own fresh-measure block after the
bench's standard warm-up, 3 reps, on an otherwise idle box.

Run:  python tools/drift_probe.py [sf_dir]    (default /root/testdata/sf0.1)
Prints one JSON line per query; verdicts vs the r6/r7 rep3 go in SCALE.md.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

WATCH = [
    "q_analytics_product_profit",
    "q_analytics_blocking_supplier",
    "q_llm_pagerank",
    "q_sparql_path",
]

# Warm (rep-2) seconds recorded by the driver: BENCH_r06 / BENCH_r07.
PRIOR = {
    "q_analytics_product_profit": (0.992, 1.154),
    "q_analytics_blocking_supplier": (1.427, 1.801),
    "q_llm_pagerank": (1.284, 1.475),
    "q_sparql_path": (1.578, 1.746),
}


def main():
    from mu_swarm_logger_service_spark import all_queries, get_spark

    spark = get_spark("drift_probe")
    queries = all_queries()
    # Same session warm-up as bench.py: scan + shuffle + pandas pool.
    queries["q_scan_parquet"](spark, SF_DIR).count()
    queries["q_agg_global"](spark, SF_DIR).count()
    n_par = spark.sparkContext.defaultParallelism
    (spark.range(0, n_par, 1, n_par).groupBy("id")
     .applyInPandas(lambda p: p, "id long").count())

    for key in WATCH:
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[key](spark, SF_DIR).count()
            reps.append(round(time.perf_counter() - t0, 3))
        r6, r7 = PRIOR[key]
        print(json.dumps({"query": key, "reps_sec": reps, "rep3": reps[2],
                          "r6_warm": r6, "r7_warm": r7,
                          "vs_r6_pct": round(100 * (reps[2] / r6 - 1), 1),
                          "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
