#!/usr/bin/env python
"""Split a query's wall time into DRIVER-SIDE CONSTRUCTION vs EXECUTION.

Construction = the query function call itself (py4j Column building, any
eager staging work inside the body); execution = the .count() action on
the returned DataFrame.  The r12 q_llm_ann_lsh finding: hundreds of py4j
round-trips during construction can dominate a sub-second query, and no
plan metric shows them — only this split does.

Usage: python tools/construct_probe.py q_a q_b ... [--sf SF_DIR] [--reps N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mu_swarm_logger_service_spark import all_queries, get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark("construct_probe")
    queries = all_queries()
    # session warm-up (same rationale as bench.py)
    queries["q_scan_parquet"](spark, sf_dir).count()
    queries["q_agg_global"](spark, sf_dir).count()

    for name in names:
        fn = queries[name]
        for r in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            print(f"{name} rep{r+1}: construct {t1-t0:.3f}s  "
                  f"execute {t2-t1:.3f}s  total {t2-t0:.3f}s  ({n} rows)",
                  flush=True)


if __name__ == "__main__":
    main()
