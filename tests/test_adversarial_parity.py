"""Oracle parity on ADVERSARIAL data distributions — the regression pin
for the round-8 hostile-fixture bug batch.

tools/gen_adversarial.py rebuilds (deterministically, seed 777) a fixture
family with the traps pristine testdata never exercises: null floods in
group/sort keys, tie-storms on measures and timestamps, hot-key skew,
duplicate texts/vectors, and unicode-rich strings.  The full sweep runs
out-of-band (SCALE.md round 8: 9 real cross-engine divergences found);
this module pins the QUERIES those bugs lived in, plus the shared
conventions they produced (explicit null policy, null placement in
sorts, zero-norm cosine, codepoint-safe edit distance, ASCII-projection
payloads), so the fixes can never silently regress.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entrymod
from gen_adversarial import generate
from mu_swarm_logger_service_spark.core.tables import TABLES
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()

# The round-8 bug batch + the proactively-hardened latent sibling.
SENSITIVE = [
    "q_agg_chi2",            # null-category policy (join vs window marginals)
    "q_sort_multi",          # null placement under LIMIT
    "q_llm_matryoshka",      # zero-norm prefix cosine
    "q_llm_rrf_fusion",      # zero-norm prefix cosine
    "q_llm_rank_eval",       # >=17-digit literal decimal double-round
    "q_graph_label_prop",    # null labels voting / null tie ordering
    "q_llm_fuzzy_token_join",  # byte vs codepoint levenshtein
    "q_llm_media_resize",    # byte vs codepoint payload length
    "q_llm_frame_sample",    # byte vs codepoint frame slicing
    "q_llm_multimodal",      # ASCII-projection payload convention
    "q_llm_edit_dedup",      # pre-DP ASCII projection (latent sibling)
    "q_llm_quality",         # empty-doc punct ratio (ANSI divide-by-zero)
    "q_llm_ngram_stats",     # 1-token doc: Spark sequence(1,0) DESCENDS
    "q_llm_collocations",    # same descending-sequence bigram trap
    # r9 trap classes (gen_adversarial gap-days + version inversion),
    # aimed at the r9 evidence-window keys:
    "q_stream_cdc_apply",    # (ts, event_id) version under id-ts inversion
    "q_stream_holt",         # day-grain recursion over calendar gap days
    "q_ts_mad_outliers",     # odd-m median branch on the main fixture
    # r9 trap class C (null-measure flood in events.value) — the eight
    # first-contact divergences, each now an explicit two-sided policy:
    "q_source_syslog",       # null-safe value rendering in line minting
    "q_source_container_logs",  # same minting policy, text-dir source
    "q_fn_format",           # formatted null measure is NULL ('nul' trap)
    "q_agg_equidepth_hist",  # histogram over observed values only
    "q_analytics_ks_test",   # CDFs over observed values only
    "q_udf_python",          # oracle mirrors the UDF's declared None branch
    "q_udf_pandas_scalar",   # JVM null gate around the pandas score
    "q_udf_register_sql",    # nullable Float64 passthrough in the UDF
    # r9 trap class D (vector pathologies: zero-norm / NULL-component /
    # Inf-component embeddings) — the 12-query ANSI-crash + ann_pq
    # value-divergence batch, all fixed by the ONE family-wide validity
    # contract (llm/similarity.py vec_valid + mirrored oracle subquery):
    "q_llm_cosine_topk",     # ANSI DIVIDE_BY_ZERO on zero-norm cosine
    "q_llm_knn_label",       # same crash, label-vote consumer
    "q_llm_cluster_purity",  # same crash via cluster assignment
    "q_llm_embed_near_dup",  # same crash inside the guarded subset
    "q_llm_hard_negatives",  # same crash, in-label ranking
    "q_llm_ann_pq",          # VALUE divergence: zero vector in codebook
    "q_llm_ann_ivf",         # crash in coarse assignment
    "q_llm_ann_ivf_pq",      # crash in residual path
    "q_llm_ann_recall",      # crash in the brute ground-truth arm
    "q_llm_kmeans_step",     # crash in assignment step
    "q_llm_semdedup",        # crash in cell-local dedup
    "q_llm_centroid",        # green-by-luck before: now contract-filtered
    # r9 trap class E (JSON pathologies in events.props) — the declared
    # payload contract: object-document gate, first-occurrence textual
    # extraction, strict integral typing, variant coercion matrix,
    # overflow-NULL k_sq (functions/scalar.py class-E block):
    "q_fn_json",
    "q_fn_variant",
    # r9 trap class C2 (null floods in the TPC-H money measures) — the
    # four rank/order statistics split by null sort order / null-cost
    # selection, each now an explicit observed-values policy:
    "q_agg_weighted_median",
    "q_agg_spearman",
    "q_analytics_min_cost_supplier",
    "q_analytics_mann_whitney",
    # r9 trap class F (zero / negative measures) — the CLF '-' no-size
    # byte-count convention with gated re-parse, and declared sqrt/ln
    # domains (DuckDB hard-errors on sqrt(negative); Spark NaNs):
    "q_source_accesslog",
    "q_ops_log_templates",
    "q_fn_math",
    # found only by the COMBINED adversarial fixture (C2 nulls x key
    # skew -> all-orders-unpriced customers with NULL revenue ranks):
    "q_analytics_revenue_gini",
    # r9 trap class G (null entity/category keys: anonymous user_id,
    # typeless events, untagged docs, unlabeled embeddings) — the
    # 26-query first-contact batch, five mechanisms (see
    # tools/gen_adversarial.py class-G bullet).  q_stream_heavy_hitters
    # is rows-only and is covered by the replay suite instead.
    "q_fn_ipnet",            # IP mint per identified user
    "q_fn_string",           # DuckDB concat() skips NULLs; || propagates
    "q_fn_struct",           # total-boolean after_mark; keep-null to_json
    "q_fn_encode",           # vacuous-true roundtrip (nullable-bool trap)
    "q_join_asof",           # identified users (null never joins null)
    "q_join_asof_nearest",   # same
    "q_ts_funnel",           # identified users
    "q_ts_holt_trend",       # identified series (recursive-join drop)
    "q_ts_holt_winters",     # same
    "q_ts_forecast_backtest",  # same
    "q_ts_lttb",             # same
    "q_ts_kaplan_meier",     # identified users
    "q_ts_pattern_match",    # identified users
    "q_stream_holt_winters",  # streaming twin of the series policy
    "q_stream_pattern_match",  # same
    "q_stream_fingerprint",  # NULLs are content: \\N sentinel canon
    "q_audit_dataset_fingerprint",  # batch twin of the sentinel
    "q_llm_dpo_pairs",       # identified (lang, source) buckets
    "q_llm_langid",          # signatures from tagged docs only
    "q_llm_tfidf_keywords",  # keywords per identified language
    "q_llm_vocab_coverage",  # coverage per identified language
    "q_sketch_kmv_jaccard",  # NULL hash priority vs bottom-K (sf0.1 find)
    # r10 trap class H (time pathologies: epoch-boundary stamps,
    # far-future instants, microsecond tie-storms) — two mechanisms:
    # unix_timestamp TRUNCATES where the oracles' floor(epoch) FLOORS
    # (they agree only post-epoch; fixed by the sign-safe core.numeric
    # epoch_s pair), and range-proportional calendar spines explode on
    # one clock-garbage stamp (fixed by the declared valid-time domain,
    # operators/timeseries.ts_domain).  q_stream_burstiness's state-fold
    # `last_us >= 0` sentinel (a -1 µs stamp collides with it) is pinned
    # here via its exact oracle too:
    "q_project_compute",     # epoch_s projection (trunc-vs-floor)
    "q_win_lag_lead",        # gap seconds across a pre-epoch boundary
    "q_win_frame_range",     # RANGE frame anchored on epoch seconds
    "q_win_time_range",      # same anchor + decimal frame sum
    "q_fn_datetime",         # datetime family epoch_s accessor
    "q_stream_burstiness",   # µs-gap state fold (negative-µs sentinel)
    "q_source_docker_events",  # unix-seconds mint in the JSONL source
    "q_ts_gapfill",          # hour spine bounded by the valid-time domain
    "q_ts_interpolate",      # same spine + global IGNORE NULLS window
    "q_ts_cross_corr",       # day lattice bounded by the domain
    "q_ts_m4_downsample",    # pixel buckets: floor-vs-trunc on negatives
    "q_join_banded",         # band bucketing on floored whole seconds
    "q_analytics_price_index",  # Fisher sqrt domain: a refund-heavy month
                                # turns the index product negative ONLY at
                                # sf0.001 sparsity (found by the first
                                # full-registry sf0.001-density sweep)
    # NB q_ts_funnel is already pinned under class G above; its r10
    # audit fix (integer-us band vs the latent fractional-epoch oracle
    # boundary) rides that same pin.
    # r10 advice additions to class E (Jackson/yyjson leniency shapes:
    # trailing doc ending in '}', nested duplicate keys, single quotes,
    # NaN token, trailing comma, control char) ride the existing
    # q_fn_json / q_fn_variant pins above via the regenerated fixture.
    # r11 ADVICE fix pins likewise: the anchored NaN/Inf clause must
    # SPARE string contents ({"note": "info"}, {"fruit": "banana"},
    # quoted "nan" values, an 'infinity' KEY) while the ','/'[' anchors
    # still reject bare tokens inside arrays — six new generator shapes.
    # r11 trap class I (NULL timestamps) — the 37-query first-contact
    # batch, five mechanisms (tools/gen_adversarial.py class-I bullet),
    # all fixed as the observed-time / \\N-sentinel / '-'-marker policy
    # family (core/tables.observed_time):
    "q_win_rank", "q_win_frame_rows", "q_win_analytic", "q_win_topk_group",
    "q_cdc_scd2", "q_layout_compaction",
    "q_join_pit_features",
    "q_ts_transitions", "q_ts_changepoint", "q_ts_locf", "q_ts_volatility",
    "q_ts_sliding_distinct", "q_ts_sessionize", "q_ts_streaks", "q_ts_sax",
    "q_ts_runs_test", "q_ts_entropy_rate", "q_ts_decompose",
    "q_ops_slo_burn",
    "q_ts_dtw",              # null-day list position: sf0.001-density find
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_stateful", "q_stream_output_modes", "q_stream_rollup",
    # (q_join_asof / q_join_asof_nearest / q_ts_holt_winters /
    #  q_ts_forecast_backtest / q_stream_holt / q_stream_holt_winters /
    #  q_stream_pattern_match / q_stream_burstiness / q_stream_fingerprint /
    #  q_audit_dataset_fingerprint / q_source_container_logs already ride
    #  pins above; their class-I arms share those rows.)
]


@pytest.fixture(scope="module")
def adv_dir(sf_dir):
    out = "/tmp/sfadv_test"
    generate(sf_dir, out)
    return out


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{adv_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SENSITIVE)
def test_adversarial_parity(spark, adv_duck, adv_dir, name):
    compare(spark, adv_duck, adv_dir, QUERIES[name], ORACLE[name], name)
