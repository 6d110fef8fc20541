#!/usr/bin/env python
"""Dump .explain('formatted') for the headline (or named) queries into
plans/<round>/<query>_<tag>.txt — the evidence files the optimization
rounds commit alongside before/after bench numbers.

Usage:
    python tools/plan_dump.py --tag before [--round r12] [query ...]

With no query names, dumps the bench HEADLINE set.  Streaming-named
queries run their registered batch twin (the registry functions are all
batch DataFrames).  The explain output is captured via the JVM plan
string, so what lands on disk is exactly what ``df.explain('formatted')``
prints.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mu_swarm_logger_service_spark import all_queries, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="before | after")
    ap.add_argument("--round", default="r12")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench

    names = args.queries or bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
