"""Sketches & deterministic sampling (SURVEY.md §2 extras; the probabilistic
data-structure tier a 100 TB pipeline leans on when exact state is too big).

Spark ships HLL (`q_agg_approx_distinct`) and KLL (`q_agg_approx_percentile`)
natively; this module adds the two other canonical sketches — **Bloom
filter** membership and **count-min** frequency — plus deterministic
**reservoir-style sampling** and a **TABLESAMPLE-shaped hash gate**, all
built from plain integer arithmetic so every one of them is bit-exact
cross-engine (unlike engine-native sketch internals, which can only be
rows-only checked; see COVERAGE.md).

Determinism design: the hash family is multiplicative-affine,
``h_i(x) = ((x * A_i + B_i) mod P) mod m`` with 64-bit-safe constants —
both Spark and DuckDB evaluate it exactly, so sketch contents, membership
answers, false positives, and over-estimates are value-identical and the
DuckDB oracle checks them EXACTLY.  Real deployments would swap in xxhash64
(same plan shape, cheaper mixing); the arithmetic family is what makes the
sketch *auditable* here.

Scale notes per operator are on the docstrings; the common theme: a sketch
is a tiny associative aggregate — map-side partials do nearly all the work,
the shuffle carries O(sketch) not O(data), and the finished sketch
broadcasts for probe-side joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.numeric import dsum, dsum_sql
from ..core.registry import query
from ..core.tables import load, observed_time

_P = 1000003  # prime modulus for the affine hash family

# (A, B) per hash function — small enough that key*A stays far below 2^63.
_HASHES = ((823117, 12289), (653189, 32771), (945137, 65537))

BLOOM_WORDS = 16          # 16 × 60 usable bits = 960-bit filter
BLOOM_BITS_PER_WORD = 60  # stay off the sign bit: 1<<59 max
CMS_WIDTH = 256           # count-min: 3 rows × 256 counters


def _h(key, a: int, b: int, m: int):
    """Affine hash h(key) = ((key*a + b) % P) % m as a Column (exact in
    64-bit integer arithmetic on both engines)."""
    return ((key * F.lit(a) + F.lit(b)) % F.lit(_P)) % F.lit(m)


def _h_sql(key: str, a: int, b: int, m: int) -> str:
    return f"((({key}) * {a} + {b}) % {_P}) % {m}"


_BLOOM_BITS = BLOOM_WORDS * BLOOM_BITS_PER_WORD

_BLOOM_SQL = f"""
WITH eval_keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'P'
), build_pos AS (
  SELECT DISTINCT CASE h.i {' '.join(f"WHEN {i} THEN {_h_sql('k', a, b, _BLOOM_BITS)}" for i, (a, b) in enumerate(_HASHES))} END AS pos
  FROM eval_keys, (VALUES {', '.join(f"({i})" for i in range(len(_HASHES)))}) h(i)
), sketch AS (
  SELECT CAST(pos // {BLOOM_BITS_PER_WORD} AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_BITS_PER_WORD} AS INT)) AS bits
  FROM build_pos GROUP BY 1
), probe_keys AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem
), probe_pos AS (
  SELECT k, h.i,
         CASE h.i {' '.join(f"WHEN {i} THEN {_h_sql('k', a, b, _BLOOM_BITS)}" for i, (a, b) in enumerate(_HASHES))} END AS pos
  FROM probe_keys, (VALUES {', '.join(f"({i})" for i in range(len(_HASHES)))}) h(i)
), probe_hits AS (
  SELECT p.k,
         MIN(CASE WHEN (COALESCE(s.bits, 0) >> CAST(p.pos % {BLOOM_BITS_PER_WORD} AS INT)) & 1 = 1
                  THEN 1 ELSE 0 END) AS maybe
  FROM probe_pos p
  LEFT JOIN sketch s ON s.word = CAST(p.pos // {BLOOM_BITS_PER_WORD} AS BIGINT)
  GROUP BY p.k
), labeled AS (
  SELECT ph.k, ph.maybe,
         CASE WHEN e.k IS NULL THEN 0 ELSE 1 END AS exact_member
  FROM probe_hits ph LEFT JOIN eval_keys e ON e.k = ph.k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(exact_member) AS BIGINT) AS n_member,
       CAST(SUM(maybe) AS BIGINT) AS n_maybe,
       CAST(SUM(CASE WHEN maybe = 1 AND exact_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM labeled
"""


@query("q_sketch_bloom", oracle=_BLOOM_SQL)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch, end to end: build a 960-bit / 3-hash
    filter over the 'P'-status order keys, probe every distinct lineitem
    order key through it, and report the confusion counts (n_maybe ≥
    n_member always; the gap is the measured false-positive cost).

    Build = explode each eval key into its 3 bit positions, groupBy WORD
    with a ``bit_or(1<<bit)`` aggregate — the filter materializes as 16
    (word, bits) rows, i.e. the shuffle carries the SKETCH, not the keys,
    and map-side bit_or partials do the folding.  Probe = broadcast those
    16 rows against the probe keys' positions; min-over-hashes decides
    membership.  At 100 TB this is the manual form of a runtime semi-join
    filter: build on the small/filtered side, broadcast, drop fact rows
    before the real join (Spark's own
    spark.sql.optimizer.runtime.bloomFilter.enabled injects exactly this
    plan); keeping it explicit makes the FP rate observable."""
    eval_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_orderkey").alias("k")).distinct()
    )
    i_col = F.explode(F.array(*[F.lit(i) for i in range(len(_HASHES))])).alias("i")

    def pos_col(key):
        c = F.lit(None).cast("long")
        for i, (a, b) in enumerate(_HASHES):
            c = F.when(F.col("i") == i, _h(key, a, b, _BLOOM_BITS)).otherwise(c)
        return c

    word = F.expr(f"pos div {BLOOM_BITS_PER_WORD}").cast("long")
    sketch = (
        eval_keys.select("k", i_col)
        .select(pos_col(F.col("k")).alias("pos"))
        .distinct()
        .select(
            word.alias("word"),
            F.expr(f"shiftleft(1L, int(pos % {BLOOM_BITS_PER_WORD}))")
            .alias("w_bit"),
        )
        .groupBy("word").agg(F.bit_or("w_bit").alias("bits"))
    )
    probe = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k")).distinct()
        .select("k", i_col)
        .select("k", pos_col(F.col("k")).alias("pos"))
        .join(F.broadcast(sketch), word == F.col("word"), "left")
        .select(
            "k",
            F.when(
                F.expr(
                    f"shiftright(coalesce(bits, 0L),"
                    f" int(pos % {BLOOM_BITS_PER_WORD})) & 1"
                ) == 1, 1
            ).otherwise(0).alias("hit"),
        )
        .groupBy("k").agg(F.min("hit").alias("maybe"))
    )
    labeled = probe.join(
        F.broadcast(eval_keys.withColumn("exact_member", F.lit(1))), "k", "left"
    ).select("k", "maybe", F.coalesce("exact_member", F.lit(0)).alias("exact_member"))
    return labeled.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("exact_member").alias("n_member"),
        F.sum("maybe").alias("n_maybe"),
        F.sum(F.when((F.col("maybe") == 1) & (F.col("exact_member") == 0), 1)
              .otherwise(0)).alias("n_false_pos"),
    )


_CMS_SQL = f"""
WITH cells AS (
  SELECT h.i,
         CASE h.i {' '.join(f"WHEN {i} THEN {_h_sql('user_id', a, b, CMS_WIDTH)}" for i, (a, b) in enumerate(_HASHES))} END AS col,
         COUNT(*) AS cnt
  FROM events, (VALUES {', '.join(f"({i})" for i in range(len(_HASHES)))}) h(i)
  GROUP BY 1, 2
), exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
), probe AS (
  SELECT e.user_id, e.exact_cnt, MIN(c.cnt) AS cms_cnt
  FROM exact e, (VALUES {', '.join(f"({i})" for i in range(len(_HASHES)))}) h(i)
  JOIN cells c
    ON c.i = h.i
   AND c.col = CASE h.i {' '.join(f"WHEN {i} THEN {_h_sql('e.user_id', a, b, CMS_WIDTH)}" for i, (a, b) in enumerate(_HASHES))} END
  GROUP BY e.user_id, e.exact_cnt
)
SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_cnt AS BIGINT) AS cms_cnt
FROM probe
"""


@query("q_sketch_countmin", oracle=_CMS_SQL)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (3 × 256 counters) over the events
    stream, probed for every user: ``cms_cnt = min_i sketch[i][h_i(u)]``
    next to the exact count (CMS never under-counts; the over-estimate is
    the collision cost, here made observable and oracle-checked exactly).

    Build = one groupBy over (row, cell): 768 counters regardless of
    stream size — the canonical "heavy state won't fit" aggregate; the
    shuffle carries O(sketch), map-side partials absorb the stream.  The
    768-row sketch then broadcasts against the (already tiny) per-user
    probe.  At 100 TB the same plan serves streaming heavy-hitters:
    `q_stream_*`-style micro-batches bit_or/add into the same cell grid
    (associative, so partial sketches merge)."""
    ev = load(spark, sf_dir, "events").select("user_id")
    i_col = F.explode(F.array(*[F.lit(i) for i in range(len(_HASHES))])).alias("i")

    def col_col(key):
        c = F.lit(None).cast("long")
        for i, (a, b) in enumerate(_HASHES):
            c = F.when(F.col("i") == i, _h(key, a, b, CMS_WIDTH)).otherwise(c)
        return c

    cells = (
        ev.select("user_id", i_col)
        .select("i", col_col(F.col("user_id")).alias("col"))
        .groupBy("i", "col").agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        exact.select("user_id", "exact_cnt", i_col)
        .select("user_id", "exact_cnt", "i",
                col_col(F.col("user_id")).alias("col"))
        .join(F.broadcast(cells), ["i", "col"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
    )


RESERVOIR_K = 50
_RES_MULT = 2654435761  # Knuth multiplicative constant
# Keys are reduced mod 2^31 BEFORE the multiply: (2^31-1) * 2654435761
# ≈ 5.7e18 stays inside signed 64-bit, so Spark (wrapping) and DuckDB
# (raising on BIGINT overflow) compute the same value even for keys past
# ~3.5e9 — e.g. l_orderkey beyond ~sf580 at the 100 TB posture.
_RES_PREMOD = 2147483648


_RESERVOIR_SQL = f"""
WITH pri AS (
  SELECT doc_id, lang,
         ((doc_id % {_RES_PREMOD}) * {_RES_MULT}) % 4294967296 AS priority
  FROM documents
)
SELECT doc_id, lang, priority,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY priority, doc_id) AS BIGINT) AS r
FROM pri
QUALIFY r <= {RESERVOIR_K}
"""


@query("q_sketch_reservoir", oracle=_RESERVOIR_SQL)
def q_sketch_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir sampling, k=50 per language:
    every row gets a hash priority, the k smallest priorities per group
    win — the "bottom-k by random tag" formulation of reservoir sampling
    (uniform when the tag is uniform; a fixed multiplicative tag here so
    the sample — and the oracle — is reproducible).

    The per-group bottom-k compiles to WindowGroupLimit: each map
    partition keeps only k rows per group before the shuffle, so at
    100 TB the exchange carries O(groups × k) rows, not the corpus —
    identical to the distributed-reservoir merge (union partial
    reservoirs, keep the k best tags)."""
    docs = load(spark, sf_dir, "documents")
    pri = docs.select(
        "doc_id", "lang",
        (((F.col("doc_id") % _RES_PREMOD) * _RES_MULT)
         % F.lit(4294967296)).alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pri.withColumn("r", F.row_number().over(w).cast("long"))
        .filter(F.col("r") <= RESERVOIR_K)
    )


_SAMPLE_PCT = 5

_SAMPLE_SQL = f"""
WITH gated AS (
  SELECT l_returnflag, l_quantity
  FROM lineitem
  WHERE ((l_orderkey % {_RES_PREMOD}) * {_RES_MULT} + l_linenumber * 97) % 100 < {_SAMPLE_PCT}
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {dsum_sql('l_quantity')} AS sum_qty,
       CAST(COUNT(*) * {100 // _SAMPLE_PCT} AS BIGINT) AS est_total_rows
FROM gated
GROUP BY l_returnflag
"""


@query("q_sketch_sample", oracle=_SAMPLE_SQL)
def q_sketch_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE-shaped deterministic gate: keep 5% of
    lineitem by key hash, then aggregate the sample and scale up — the
    cheap-estimate pattern for interactive exploration over 100 TB
    (Spark's own TABLESAMPLE(BERNOULLI) is seed-dependent per partition
    split, so it cannot be oracle-checked; the hash gate is the
    reproducible equivalent and additionally SAMPLES BY KEY, surviving
    joins on l_orderkey — both sides of a key-sampled join stay
    consistent).  The gate is a scan-stage filter: rows drop before any
    shuffle, so downstream cost scales with the sample, not the table."""
    li = load(spark, sf_dir, "lineitem")
    gate = (((F.col("l_orderkey") % _RES_PREMOD) * _RES_MULT
             + F.col("l_linenumber") * 97) % 100 < _SAMPLE_PCT)
    return (
        li.filter(gate)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            (F.count(F.lit(1)) * (100 // _SAMPLE_PCT)).alias("est_total_rows"),
        )
    )


# Per-stratum keep rates in permille: downsample the dominant language,
# keep most of the tail — the standard move when rebalancing a crawl where
# one language would otherwise swamp the mixture.
_STRATA_PERMILLE = {"en": 200}
_DEFAULT_PERMILLE = 800

_STRATified_CASE = "CASE WHEN lang = 'en' THEN 200 ELSE 800 END"

_STRAT_SQL = f"""
WITH gated AS (
  SELECT lang,
         {_STRATified_CASE} AS keep_permille,
         ((doc_id % {_RES_PREMOD}) * {_RES_MULT}) % 1000 AS gate
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN gate < keep_permille THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       keep_permille
FROM gated
GROUP BY lang, keep_permille
"""


@query("q_sketch_stratified", oracle=_STRAT_SQL)
def q_sketch_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: each language stratum gets its
    OWN keep rate (en 20%, tail languages 80%) through the same
    reproducible hash gate as q_sketch_sample — the per-stratum variant a
    training pipeline uses to downsample the dominant language without
    touching the tail (cheaper than full rebalancing when quotas are
    rate-shaped rather than count-shaped; q_llm_rebalance covers the
    count-shaped case).

    The gate is a scan-stage filter expression with NO per-stratum pass:
    one scan, rate looked up per row from the (broadcast-sized, here
    inline CASE) rate table, rows drop before any shuffle.  The audit
    output (kept vs total per stratum) is one aggregate; at 100 TB the
    sampled WRITE would replace the audit but the gate is identical."""
    docs = load(spark, sf_dir, "documents")
    rate = (F.when(F.col("lang") == "en", _STRATA_PERMILLE["en"])
            .otherwise(_DEFAULT_PERMILLE))
    gate = ((F.col("doc_id") % _RES_PREMOD) * _RES_MULT) % 1000
    return (
        docs.select("lang", rate.alias("keep_permille"), gate.alias("gate"))
        .groupBy("lang", "keep_permille")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("gate") < F.col("keep_permille"), 1)
                  .otherwise(0)).alias("n_kept"),
        )
        .select("lang", "n_total", "n_kept", "keep_permille")
    )


_BITMAP_SQL = """
WITH words AS (
  SELECT event_type, CAST(user_id // 60 AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT)) AS bits
  FROM events GROUP BY 1, 2
), bm AS (
  SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_bitmap
  FROM words GROUP BY event_type
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT event_type, n_distinct_bitmap, n_distinct_exact
FROM bm JOIN ex USING (event_type)
"""


@query("q_sketch_bitmap_distinct", oracle=_BITMAP_SQL)
def q_sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap OR-aggregation (the roaring-
    bitmap pattern): pack each user id into (word, bit), ``bit_or`` the
    words per group, popcount at the end — next to the expanding
    ``COUNT(DISTINCT)`` for an oracle-checked equality.

    Why it matters at 100 TB: COUNT(DISTINCT) expands to a two-phase
    aggregate whose first shuffle carries every DISTINCT (group, key)
    pair; the bitmap form's shuffle carries ≤ one 8-byte word per 60 keys
    per group — and bitmap partials merge with a single OR, so map-side
    combining stays effective no matter how many rows repeat a key.  The
    same (word, bits) layout is incrementally mergeable across days /
    micro-batches (OR is idempotent), which COUNT(DISTINCT) results are
    not."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 60").cast("long").alias("word"),
            F.expr("shiftleft(1L, int(user_id % 60))").alias("w_bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("w_bit").alias("bits"))
    )
    bm = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_distinct_bitmap")
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct_exact")
    )
    return bm.join(ex, "event_type")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: the deterministic-guarantee frequent-items
# sketch (Misra & Gries 1982; the SpaceSaving/top-k family).  Unlike
# count-min (random over-estimates) MG gives hard bounds from k counters:
# every estimate UNDER-counts by at most n/(k+1), so any item with true
# frequency above n/(k+1) is guaranteed to survive.  Training pipelines use
# it for hot-key / vocab-head detection where the candidate set must be
# provably complete.
# ---------------------------------------------------------------------------

MG_COUNTERS = 32   # k counters per shard summary
MG_SHARDS = 16     # deterministic shards (hash of the row key, not splits)


@query("q_sketch_heavy_hitters")
def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over events.user_id via sharded Misra-Gries.

    Stage 1 shards rows by ``pmod(xxhash64(event_id), 16)`` — a DATA hash,
    not physical splits, so shard contents (and therefore the whole result)
    are deterministic regardless of file layout — and runs the k-counter
    MG scan per shard in one Arrow-batched ``applyInPandas`` pass over rows
    ordered by (ts, event_id).  The sequential counter algorithm is the one
    thing here Catalyst cannot express; its state is O(k) per shard.
    Stage 2 merges relationally: sum per-item counter values, then apply
    the standard merged-MG decrement (the (k+1)-largest combined weight)
    and keep positives — plain aggregates, one shuffle of ≤ k·shards rows.
    At 100 TB the shuffle carries 512 rows total: the sketch IS the
    communication bound.  Per-shard error ≤ n_shard/(k+1) and the merge
    decrement sum to ≤ 2n/(k+1) under-count overall, never over-count —
    registered rows-only (sequential MG has no DuckDB twin); the guarantee
    is asserted against exact counts in
    tests/test_properties.py::test_heavy_hitters_mg_guarantees."""
    import pandas as pd

    # class G: identified items only; class I: observed-time only — the
    # fold consumes items in (ts, event_id) order, and an unstamped event
    # has no position in that order (the streaming twin's replay splits
    # batches by ts, so a NaT row would fold FIRST there but LAST here —
    # the hostile-replay gate's fold-order divergence).  Matches the
    # streaming twin; the replay test asserts stream state == this fold.
    ev = observed_time(load(spark, sf_dir, "events")).filter(
        F.col("user_id").isNotNull()).select(
        F.pmod(F.xxhash64("event_id"), F.lit(MG_SHARDS)).alias("shard"),
        "event_id", "ts", F.col("user_id").alias("item"),
    )

    def mg_partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
        counters: dict[int, int] = {}
        for item in pdf.sort_values(["ts", "event_id"])["item"]:
            if item in counters:
                counters[item] += 1
            elif len(counters) < MG_COUNTERS:
                counters[item] = 1
            else:
                counters = {i: c - 1 for i, c in counters.items() if c > 1}
        return pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())})

    partials = ev.groupBy("shard").applyInPandas(
        mg_partial, "item long, est long")
    return mg_merge(partials)


def mg_merge(partials: DataFrame) -> DataFrame:
    """Relational merge of per-shard Misra-Gries summaries → heavy-hitter
    candidates (user_id, est_count): sum per-item counter values, subtract
    the standard merged-MG decrement (the (k+1)-largest combined weight),
    keep positives.  Shared by the batch sketch (q_sketch_heavy_hitters)
    and the streaming stateful variant (streaming/queries.
    q_stream_heavy_hitters) so both merge identically."""
    summed = partials.groupBy("item").agg(F.sum("est").alias("est"))
    w = Window.orderBy(F.desc("est"), "item")
    dec = (
        summed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == MG_COUNTERS + 1)
        .select(F.col("est").alias("dec"))
    )
    return (
        summed.crossJoin(
            F.broadcast(dec.unionByName(
                summed.sparkSession.range(1).select(F.lit(0).alias("dec"))
            ).agg(F.max("dec").alias("dec"))))
        .select(F.col("item").alias("user_id"),
                (F.col("est") - F.col("dec")).alias("est_count"))
        .filter(F.col("est_count") > 0)
    )


_WS_BLOCK = 64   # docs per prefix-sum block (two-phase scan granularity)
_WS_K = 50       # target sample size (ticks)

_WEIGHTED_SAMPLE_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, source, n_chars AS wt FROM documents
), c AS (
  SELECT *, SUM(wt) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wt) OVER () AS total
  FROM w
), t AS (
  SELECT *, GREATEST(CAST(total // {_WS_K} AS BIGINT), 1) AS step FROM c
)
SELECT doc_id, lang, source, CAST(wt AS BIGINT) AS wt,
       CAST(cum // step - (cum - wt) // step AS BIGINT) AS n_ticks
FROM t
WHERE cum // step - (cum - wt) // step > 0
"""


@query("q_sketch_weighted_sample", oracle=_WEIGHTED_SAMPLE_SQL)
def q_sketch_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) sampling via SYSTEMATIC
    selection on the integer cumulative-weight line: lay all documents on
    [0, total_weight) in doc_id order, drop a tick every ``step =
    total // K`` units, and select every document whose weight interval
    contains a tick — inclusion probability = weight/step, the PPS
    property, and an item heavier than ``step`` is selected with
    multiplicity (``n_ticks``), the honest oversized-weight semantics.

    Chosen over Efraimidis-Sampling's u^(1/w) keys on purpose: that form
    needs pow/ln, and libm differs between the JVM and DuckDB in the last
    ulp, which makes a rank-by-float sample un-checkable cross-engine.
    Systematic PPS is INTEGER-ONLY (cumsum + two floor divisions), so the
    sample is bit-exact on both engines and the oracle checks membership
    AND multiplicity exactly.

    The global prefix sum — the scale hazard of any cumulative method —
    is computed as a TWO-PHASE SCAN, never a single-partition window over
    the data: per-block subtotals (one narrow groupBy on ``doc_id div
    B``), a running offset over the tiny block list (the only global
    window, sized #blocks ≈ n/B rows — KBs at 100 TB), then a
    block-partitioned window adds local prefixes to broadcast offsets.
    This is the textbook distributed scan; the same shape serves CDF /
    quantile-line computations generally."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.col("n_chars").alias("wt")
    ).withColumn("g", F.expr(f"doc_id div {_WS_BLOCK}"))

    # Phase 1: per-block subtotals (scales: one small shuffle).
    blocks = docs.groupBy("g").agg(F.sum("wt").alias("gw"))
    # Phase 2: running offsets over the block list — #blocks rows only.
    woff = (
        Window.orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = blocks.select(
        "g", F.coalesce(F.sum("gw").over(woff), F.lit(0)).alias("off")
    )
    total = blocks.agg(F.sum("gw").alias("total"))
    # Phase 3: local prefix within each block + broadcast offset/total.
    wloc = (
        Window.partitionBy("g").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        docs.join(F.broadcast(offsets), "g")
        .crossJoin(F.broadcast(total))
        .withColumn("cum", F.col("off") + F.sum("wt").over(wloc))
        .withColumn("step", F.greatest(F.expr(f"total div {_WS_K}"), F.lit(1)))
    )
    ticks = (F.expr("cum div step") - F.expr("(cum - wt) div step"))
    return (
        cum.withColumn("n_ticks", ticks)
        .filter(F.col("n_ticks") > 0)
        .select("doc_id", "lang", "source", "wt", "n_ticks")
    )


@query("q_sketch_hll_rollup")
def q_sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch REUSE (Apache DataSketches via Spark's hll_sketch_agg /
    hll_union_agg): build one distinct-user sketch per (event_type, day)
    — the granularity a warehouse would PERSIST — then roll up to
    per-type distinct counts by UNIONING the stored sketches, never
    re-touching the raw events.  This is the capability
    q_agg_approx_distinct lacks: approx_count_distinct answers one
    question per scan; mergeable sketches answer every coarser rollup
    from pre-aggregated state (the sketch column is the data product).

    At 100 TB: the daily sketch build is the only raw-data pass (one
    shuffle, map-side partial sketch merge); every rollup thereafter
    shuffles KB-sized sketch blobs.  Sketch contents are
    order-independent (per-register max), so the result is deterministic
    — but DuckDB has no DataSketches twin, so the query registers
    rows-only; tests/test_properties.py bounds the union estimate
    against the exact distinct count at lgk=12 (rsd ≈ 1.6%)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.groupBy("event_type").agg(
        F.expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as bigint)")
        .alias("est_distinct_users"),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days_merged"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002's bottom-k
# estimator.  The deterministic sibling of HLL: where hll_sketch_agg
# (q_sketch_hll_rollup) is opaque to a cross-engine oracle, a KMV built on
# the repo's affine hash family is bit-reproducible in plain SQL, so the
# WHOLE sketch pipeline — partial build, merge, estimate — is value-exact
# and DuckDB-checked.
# ---------------------------------------------------------------------------

KMV_K = 64            # sketch size: rel. std err ≈ 1/sqrt(K-2) ≈ 12.7%
# Two-stage priority hash.  A single affine map mod 2^31-1 does NOT wrap for
# small contiguous id ranges (823117·1000 << 2^31), leaving priorities as an
# unmixed arithmetic prefix and the estimator off by >100% at sf0.001.
# Permuting mod a 2^25-sized prime first guarantees wraparound even for
# thousand-row key ranges (step/P1 ≈ 1/41), then a constant stretch spreads
# the result over ~[0, 2^31).  The low-discrepancy lattice this produces is
# estimator-friendly (measured max rel err ≤ 0.29 at sf0.001-0.1, under the
# 4σ ≈ 0.51 bound); the price is injectivity only below P1 ≈ 33.5M distinct
# keys per group — beyond that the sketch saturates, which is the documented
# trade for cross-engine exactness (swap in xxhash64 at deployment, as the
# module header says, and the oracle becomes rows-only like the HLL twin).
KMV_P1 = 33554393     # prime near 2^25: stage-1 permutation modulus
KMV_STRETCH = 64      # stage-2 spread: priorities live in [0, P1·64)
KMV_P = KMV_P1 * KMV_STRETCH
KMV_A, KMV_B = 823117, 12289
KMV_SHARDS = 16       # deterministic partials (hash shards, not splits)

_KMV_SQL = f"""
WITH pri AS (
  SELECT DISTINCT event_type,
         ((event_id * {KMV_A} + {KMV_B}) % {KMV_P1}) * {KMV_STRETCH} AS pri
  FROM events
), ranked AS (
  SELECT event_type, pri,
         row_number() OVER (PARTITION BY event_type ORDER BY pri) AS rn
  FROM pri
), sk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(pri) AS kth_min
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT)
           AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT sk.event_type, sk.k_used, sk.kth_min,
       CASE WHEN sk.k_used < {KMV_K} THEN CAST(sk.k_used AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE) * {KMV_P} / sk.kth_min
       END AS est_distinct,
       ex.n_distinct_exact
FROM sk JOIN ex ON ex.event_type = sk.event_type
"""


def kmv_priority(key="event_id"):
    """The two-stage lattice priority as a Column (exact on both engines)."""
    return (
        (F.col(key) * F.lit(KMV_A) + F.lit(KMV_B)) % F.lit(KMV_P1)
    ) * F.lit(KMV_STRETCH)


def kmv_bottomk(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """Bottom-K DISTINCT priorities per partition of ``part_cols`` — the KMV
    partial.  dense_rank absorbs duplicate keys without a pre-distinct
    shuffle (duplicates carry equal priorities); the select-distinct after
    the cut touches <= K rows per partition.  Closed under composition:
    bottom-K of a union of bottom-Ks is the bottom-K of the union — the
    merge the streaming variant and the sharded batch both lean on."""
    w = Window.partitionBy(*part_cols).orderBy("pri")
    return (
        df.withColumn("rk", F.dense_rank().over(w))
        .where(F.col("rk") <= KMV_K)
        .select("event_type", "pri")
        .distinct()
    )


def kmv_finalize(pri_df: DataFrame, ex_df: DataFrame) -> DataFrame:
    """(group, pri) bottom-K rows + (group, n_distinct_exact) -> the sketch
    summary row with the (K-1)·P / kth_min estimate (one fixed-shape IEEE
    division on exactly representable operands — no round() needed)."""
    sk = pri_df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("pri").alias("kth_min"),
    )
    est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(KMV_P) / F.col("kth_min")
    )
    return sk.join(ex_df, "event_type").select(
        "event_type", "k_used", "kth_min",
        est.alias("est_distinct"), "n_distinct_exact",
    )


@query("q_sketch_kmv", oracle=_KMV_SQL)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch per event_type, built the way a cluster would:
    per-SHARD bottom-k partials, then a merge that re-ranks the union of
    partials — and an estimate (K-1)·P / kth_min checked EXACTLY against
    DuckDB computing the sketch directly (no shards).  Parity of the
    two-level Spark path against the one-level SQL oracle is the proof
    that KMV partials are losslessly mergeable: the global bottom-k IS
    the bottom-k of the union of per-shard bottom-ks whenever the shards
    partition the key space (shard = key mod 16 here, so duplicate keys
    collapse inside one shard and never double-count).

    Priorities come from the two-stage lattice hash above: injective for
    keys below P1, so distinct keys ⇔ distinct priorities at every test
    scale and both engines agree bit-for-bit — the reason this registers
    with an exact oracle while the HLL twin is rows-only.

    At 100 TB: stage 1 is one shuffle on (group, shard) where dense_rank
    keeps K values per shard (WindowGroupLimit pushes the cut into the
    map side); everything after carries ≤ K·SHARDS 8-byte priorities per
    group.  Persisted per-partition partials answer any later rollup by
    re-merging K-lists — the same pre-aggregation contract as
    q_sketch_hll_rollup, but auditable.  The estimate divides two exactly
    representable values in one fixed-shape expression (no round()), per
    the one-IEEE-op rule in the verify gotchas."""
    ev = load(spark, sf_dir, "events").select("event_type", "event_id")
    t = ev.select(
        "event_type",
        kmv_priority().alias("pri"),
        F.pmod("event_id", F.lit(KMV_SHARDS)).alias("shard"),
    )
    # Stage 1 — per-(group, shard) partial; stage 2 — merge: bottom-K of
    # the union of partials (closure of kmv_bottomk under composition).
    partial = kmv_bottomk(t, ["event_type", "shard"])
    merged = kmv_bottomk(partial, ["event_type"])
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("event_id").alias("n_distinct_exact")
    )
    return kmv_finalize(merged, ex)


# ---------------------------------------------------------------------------
# KMV set similarity — Jaccard between the HIGH-VALUE user sets of every
# event-type pair, estimated from the union's bottom-K sketch and checked
# against the exact Jaccard in the same row.  The pairwise-overlap
# primitive at sketch cost: at real cardinalities the exact path is a
# user-keyed self-join, the sketch path ships K=64 integers per set and
# estimates ANY pair's overlap from merged partials — the audience-overlap
# query every ads/reach dashboard runs.  Value >= 200 gates membership
# (at fixture density every user is in every set — the Shapley lesson).
# ---------------------------------------------------------------------------

_KMV_JAC_SQL = f"""
WITH pu AS (
  SELECT DISTINCT event_type,
         user_id,
         ((user_id * {KMV_A} + {KMV_B}) % {KMV_P1}) * {KMV_STRETCH} AS pri
  FROM events
  WHERE value >= 200 AND event_type <> 'purchase'
    AND user_id IS NOT NULL
), types AS (
  SELECT DISTINCT event_type FROM pu
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
), sides AS (
  SELECT p.ta, p.tb, u.pri,
         MAX(CASE WHEN u.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN u.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN pu u
    ON u.event_type = p.ta OR u.event_type = p.tb
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT ta, tb, pri, in_a, in_b,
         row_number() OVER (PARTITION BY ta, tb ORDER BY pri) AS rn
  FROM sides
), sk AS (
  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(in_a * in_b) AS BIGINT) AS k_both
  FROM ranked WHERE rn <= {KMV_K} GROUP BY 1, 2
), ex AS (
  SELECT ta, tb,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(SUM(in_b) AS BIGINT) AS n_b,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
  FROM sides GROUP BY 1, 2
)
SELECT sk.ta AS type_a, sk.tb AS type_b, sk.k_used, sk.k_both,
       CAST(sk.k_both AS DOUBLE) / sk.k_used AS j_est,
       CAST(ex.n_both AS DOUBLE) / (ex.n_a + ex.n_b - ex.n_both)
         AS j_exact
FROM sk JOIN ex ON ex.ta = sk.ta AND ex.tb = sk.tb
"""


@query("q_sketch_kmv_jaccard", oracle=_KMV_JAC_SQL)
def q_sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard of high-value user sets: bottom-K union sketch
    estimate next to the exact value.

    Determinism: the KMV priority is the repo's exact affine lattice
    (injective below P1, identical integers cross-engine), membership
    flags and intersection counts are integers, and both Jaccards are
    single divisions of exact integers — the whole row is value-exact,
    which is what makes the ESTIMATOR itself auditable by the oracle
    (the |j_est − j_exact| error bound is pinned separately by a
    property test).  Plan: one distinct (type, user) pass; the pair
    expansion multiplies rows by (|types|−1) only — each user row lands
    in the ≤4 pairs naming its type — then a (pair, pri) rollup and a
    pair-partitioned rank; everything downstream of the rank cut is
    K-bounded per pair.  At 100 TB the sketch path is the point: the
    bottom-K partials merge losslessly (kmv_bottomk composition), so
    any pair's overlap estimate costs K integers per side, not a
    user-keyed self-join."""
    # class G: membership sets are of IDENTIFIED users — an anonymous
    # row's NULL hash priority would ride Spark NULLS FIRST into the
    # bottom-K sketch while DuckDB's NULLS LAST keeps it out (found by
    # the combined adversarial fixture at sf0.1 density only).
    ev = load(spark, sf_dir, "events").filter(
        (F.col("value") >= 200) & (F.col("event_type") != "purchase")
        & F.col("user_id").isNotNull())
    pu = (ev.select("event_type", "user_id").distinct()
          .select("event_type", "user_id",
                  kmv_priority("user_id").alias("pri")))
    types = pu.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("ta"))
             .join(types.select(F.col("event_type").alias("tb")),
                   F.col("ta") < F.col("tb")))
    sides = (F.broadcast(pairs).join(
        pu, (pu.event_type == F.col("ta")) | (pu.event_type == F.col("tb")))
        .groupBy("ta", "tb", "pri")
        .agg(F.max(F.when(F.col("event_type") == F.col("ta"), 1)
                   .otherwise(0)).alias("in_a"),
             F.max(F.when(F.col("event_type") == F.col("tb"), 1)
                   .otherwise(0)).alias("in_b")))
    w = Window.partitionBy("ta", "tb").orderBy("pri")
    sk = (sides.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= KMV_K)
          .groupBy("ta", "tb")
          .agg(F.count(F.lit(1)).cast("long").alias("k_used"),
               F.sum(F.col("in_a") * F.col("in_b")).cast("long")
               .alias("k_both")))
    ex = sides.groupBy("ta", "tb").agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"))
    return (sk.join(ex, ["ta", "tb"])
            .select(F.col("ta").alias("type_a"),
                    F.col("tb").alias("type_b"),
                    "k_used", "k_both",
                    (F.col("k_both").cast("double") / F.col("k_used"))
                    .alias("j_est"),
                    (F.col("n_both").cast("double")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_both")))
                    .alias("j_exact")))
