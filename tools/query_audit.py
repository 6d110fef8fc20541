#!/usr/bin/env python
"""Sweep EVERY registered query once: wall time + physical-plan metrics.

Writes one JSON line per query to the output file:
    {"name", "wall_s", "rows", "exchanges", "broadcasts", "py_evals",
     "scans", "smj", "shj", "bhj", "err"}

Plan metrics are substring counts over explain('formatted') of the final
DataFrame (iterative queries' committed plans only show the last round —
the wall time still covers the whole computation).  Used by the r12
optimization round to build the per-operator checklist and catch
non-headline whales; re-run after changes for a like-for-like (same
session) comparison by passing two round tags is NOT supported — run it
twice and diff.

Usage: python tools/query_audit.py [out.jsonl] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mu_swarm_logger_service_spark import all_queries, get_spark  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/query_audit.jsonl"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def plan_metrics(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    ops = [ln for ln in plan.splitlines() if ln.startswith("(")]
    head = "\n".join(ln.split(") ", 1)[-1] for ln in ops)
    return {
        "exchanges": sum("Exchange" in ln and "Broadcast" not in ln
                         for ln in ops),
        "broadcasts": sum("BroadcastExchange" in ln for ln in ops),
        "py_evals": sum(any(t in ln for t in (
            "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
            "FlatMapGroupsInPandas", "MapInArrow")) for ln in ops),
        "scans": sum("Scan parquet" in ln for ln in ops),
        "smj": head.count("SortMergeJoin"),
        "shj": head.count("ShuffledHashJoin"),
        "bhj": head.count("BroadcastHashJoin"),
    }


def main() -> None:
    spark = get_spark("query-audit")
    qs = all_queries()
    # session warmup (mirrors bench.py's purpose, minimal form)
    qs["q_scan_parquet"](spark, SF_DIR).count()
    n_par = spark.sparkContext.defaultParallelism
    (spark.range(0, n_par, 1, n_par).groupBy("id")
     .applyInPandas(lambda p: p, "id long").count())

    only = set(sys.argv[3:])  # optional subset
    with open(OUT, "w") as fh:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(name)
            rec = {"name": name}
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                rec.update(plan_metrics(df))
                rec["rows"] = df.count()
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["wall_s"] = round(time.perf_counter() - t0, 3)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"{rec.get('wall_s'):>8}s {name}"
                  + (" ERR" if "err" in rec else ""))


if __name__ == "__main__":
    main()
