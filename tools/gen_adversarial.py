#!/usr/bin/env python
"""Generate an adversarial-distribution fixture family (default /tmp/sfadv).

Same schemas and row counts as the driver's testdata, hostile values:

- **tie-storms**: measure columns quantized to a handful of values and
  30-40%% of timestamps collapsed onto one instant, so every window /
  ranking ORDER BY faces massive ties and only the unique-tiebreaker
  discipline (CLAUDE.md determinism rules) disambiguates.  A query whose
  ordering lacks a tiebreaker goes nondeterministic here and fails the
  Spark-vs-DuckDB value hash.
- **null floods**: 5-15%% nulls in non-key nullable columns (group keys
  included — null-group semantics differ subtly across engines).
- **key skew**: 25-30%% of fact-table foreign keys collapsed onto one
  popular customer / part / supplier / user — the shape AQE skew-join
  handling sees at 100 TB.
- **duplicate storms**: exact-duplicate document texts and identical
  embedding vectors (cosine ties; dedup groups spanning sources).
- **unicode-rich text**: emoji / CJK / combining accents / zero-width
  space mixed into free-text columns (names, document text, JSON props)
  to stress tokenizers, regexes and length semantics cross-engine.
- **gap days / odd-length series** (r9): three middle calendar days
  vacated (their events shifted +1 day, counts preserved) so day-grain
  recursive smoothers see calendar holes and rank-select medians hit the
  odd-m branch on the main fixture.
- **version-order inversion** (r9): ~20%% of users get their event_ids
  permuted to OPPOSE ts order, so CDC latest-state / as-of consumers
  that version by event_id alone (or tiebreak the wrong way) diverge
  instead of riding the pristine fixture's id-ts monotonicity.
- **vector pathologies** (r9): all-zero embeddings, NULL components and
  +Inf components — failed/partial encoder output.  The vector family's
  validity contract (llm/similarity.py vec_valid + the mirrored oracle
  subquery) must exclude them identically on both sides; first contact
  crashed 12 queries (ANSI DIVIDE_BY_ZERO on zero norms, DuckDB
  list_cosine_similarity NULL rejection) and value-diverged q_llm_ann_pq.
- **JSON pathologies** (r9): ~12%% of events.props replaced with the
  shapes 100 TB of logged JSON actually contains — malformed docs,
  duplicate keys, numbers beyond int64 (and int64-overflow squares),
  wrong-typed/nested/bool values, trailing garbage.  The JSON queries'
  declared payload contract (functions/scalar.py class-E block) must
  resolve every shape identically in both engines; the engines' native
  parsers disagree on ALL of them unaided (first-vs-last duplicate key,
  Jackson's trailing-garbage tolerance, DuckDB's rounding CAST).
- **null-measure flood** (r9): ~5%% of events.value set to NULL (NaN in
  the pandas frame; pyarrow converts to parquet null).  Found eight real
  divergences on first contact: null lines in log minting, Java
  Formatter rendering a null %%.3f arg as 'nul', NULL-cents groups riding
  the engines' opposite null sort orders into CDF/histogram prefix sums,
  DuckDB greatest()/least() SKIPPING the null where pandas carries NaN
  through, and oracle CASEs falling to ELSE where the UDF declares a
  'none' branch.
- **zero / negative measures** (r9, class F): idle-sensor zeros and
  refund negatives in events.value and l_extendedprice (the old
  generator FLOORED these away).  First contact crashed the CLF
  byte-count mint (ANSI cast of the negative token) and DuckDB's sqrt
  on refund prices; the policies are the CLF '-' no-size convention
  with a gated integral re-parse, and declared math-function domains.
- **null entity/category keys** (r9, class G): anonymous events
  (NULL user_id), typeless events (NULL event_type), untagged documents
  (NULL lang/source), unlabeled embeddings (NULL label).  First contact
  split 26 queries through five mechanisms: equi-joins dropping the
  null-key groups that windows/groupBy keep (holt's recursive step, the
  funnel/dpo USING joins), NULL rank/tie placement (knn votes, langid
  argmax), minting null-propagation (syslog/container-logs/CLF lines,
  the fingerprint's concat_ws arity), pandas NaN integer crashes
  (Misra-Gries items), and nullable-boolean dtype rendering — each now a
  declared identified-rows / null-safe-render / total-boolean policy.
- **time pathologies** (r10, class H): epoch-boundary stamps (exact
  epoch zero, the last pre-epoch microsecond, and sub-microsecond
  offsets on BOTH sides of the epoch — the ns→µs conversion's
  floor-vs-truncate sign semantics only differ there), one far-future
  instant (2200, inside datetime64[ns] range — calendar spines and
  watermark arithmetic meet a 230-year range), and a microsecond
  tie-storm (~8%% of events within 2 µs of one instant — any window
  ORDER BY ts without the unique event_id tiebreak goes
  nondeterministic).  `ts` was the last fixture column never made
  hostile.
- **null timestamps** (r11, class I): ~1.5%% NaT in events.ts (a parse
  failure / missing-field reality class H's VALUE pathologies cannot
  reach).  First contact split 37 queries through five mechanisms:
  ts-ordered windows (Spark NULLS FIRST vs DuckDB NULLS LAST changes
  every lag/rank/prefix), Spark's F.window() DROPPING null-ts rows
  where time_bucket keeps a null bucket, pandas state folds reading
  NaT.value as int64-min garbage, fingerprint concat_ws arity collapse,
  and the container-log mint's ANSI re-parse crash.  The declared
  policy family: OBSERVED-TIME events only wherever time is the axis
  (core/tables.observed_time ↔ "ts IS NOT NULL" — forced by streaming,
  where watermarks drop null event times outright), the \\N sentinel
  where ts is CONTENT (fingerprints), and the '-' missing marker where
  ts is RENDERED (container logs, with a tolerant try_to_timestamp
  re-parse).
- **money-measure null flood** (r9, class C2): ~3%% NULLs in the TPC-H
  fact/dim measures (l_extendedprice/discount/tax/quantity,
  o_totalprice, acctbals, p_retailprice).  First contact split 4
  rank/order statistics (weighted median, Spearman, min-cost-supplier
  argmin, Mann-Whitney) through the same null-sort-order and
  null-selection mechanisms class C found on events.value — each now an
  explicit observed-values policy.
- **content pathologies** (r12, class J): the ts axis got three hostile
  classes (H, I, C/G null keys) while the TEXT axis only ever saw
  class A's unicode-rich strings.  Four document shapes — MULTI-MEGABYTE
  single documents (fixed count per density: 1-3 MB of repeated prose
  with per-doc salt tokens, the "someone pasted a log file into the
  corpus" reality), WHITESPACE-ONLY documents (ASCII runs plus
  NBSP/EM-SPACE/IDEOGRAPHIC-SPACE — split-on-' ' sees one giant token
  where a unicode-aware tokenizer sees none), REGEX-BAIT documents
  (long runs of near-matching prefixes against the CLF/token-shape
  patterns: 'GET /a HTT ' runs, 100k-char single tokens, digit runs —
  backtracking engines go quadratic where RE2 stays linear, so these
  are a wall-clock trap as much as a value trap), ASTRAL/COMBINING
  STORMS (ZWJ emoji families, astral-plane letters, 12-deep combining
  stacks — aimed at the byte-vs-codepoint seams the printable-ASCII
  payload convention exists for) — plus three events.props shapes:
  64-DEEP nested JSON (with a duplicate key at depth 32 and the usable
  top-level k the payload contract extracts), a 1000-element array
  value, and a ~16 KB string value carrying regex bait INSIDE a JSON
  string.  Independent RandomState(781) so classes A-I stay
  byte-identical.

- **non-finite measures** (r12, class L): TRUE IEEE NaN, ±Inf, -0.0, and
  magnitude garbage (1e308, 1e22) in events.value, l_extendedprice and
  o_totalprice.  Every earlier "NaN" fixture was silently a NULL fixture
  (pandas NaN -> parquet NULL through from_pandas); class L ships real
  non-finite doubles via an arrow post-pass in _write.  What a corrupt
  sensor / price feed emits at 100 TB: a divide-by-zero upstream is +Inf,
  a bit flip is 1e308, a failed conversion is NaN.  Measured engine
  splits this class exists for: both engines CRASH casting NaN/Inf/1e308
  to DECIMAL (the dsum determinism path), DuckDB hard-errors STDDEV with
  an Inf where Spark yields NaN, and string renderings diverge
  ('NaN'/'Infinity'/'1.0E308' vs 'nan'/'inf'/'1e+308').  Independent
  RandomState(783) so classes A-K stay byte-identical.

Domains of categorical columns (statuses, flags, langs, brands) are
preserved so literal-filtering queries stay non-vacuous.  `documents.
n_chars` is recomputed after text mutation to preserve the generator
invariant n_chars == len(text).  Output is written with the ORIGINAL
arrow schema (int32 / timestamp[us] / list<float> preserved).

Deterministic: numpy RandomState(777); same base dir -> same bytes.

Usage:  python tools/gen_adversarial.py [base_sf_dir] [out_dir]
        (defaults: /root/testdata/sf0.01 -> /tmp/sfadv)
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 777

# Unicode payloads: emoji, CJK, Greek, combining accent, zero-width space,
# RTL Hebrew.  All single-codepoint-countable so len() semantics agree.
UNI_WORDS = [
    "café", "中文表", "δοκιμή",
    "naïve", "\U0001f642ok", "שלום",
    "éclair", "z​w", "Über", "日本語",
]


def _uni(rng, s, frac, rows):
    """Append a deterministic unicode word to a fraction of strings."""
    mask = rng.random_sample(rows) < frac
    pick = rng.randint(0, len(UNI_WORDS), rows)
    return pd.Series(
        [f"{v} {UNI_WORDS[p]}" if m and v is not None else v
         for v, m, p in zip(s, mask, pick)], dtype=object)


def _nullf(rng, s, frac, rows):
    """NULL-flood a float measure column (np.nan -> parquet null)."""
    v = s.to_numpy(dtype=float).copy()
    v[rng.random_sample(rows) < frac] = np.nan
    return v


def _null(rng, s, frac, rows):
    out = s.copy().astype(object)
    out[rng.random_sample(rows) < frac] = None
    return out


def _write(out, name, df, schema, nan_at=None):
    """Write df under the original schema.  ``nan_at`` maps column name ->
    row indices that must carry a TRUE IEEE NaN in the parquet file.
    pandas cannot express that distinction — ``pa.Table.from_pandas``
    converts every float NaN to a parquet NULL (the round-9 "NaN fixtures
    are really null fixtures" gotcha), which is why eleven rounds of
    hostile fixtures never actually shipped a NaN double.  The arrow
    post-pass rebuilds the column from numpy (``from_pandas=False`` path:
    NaN is a VALUE) with the original null mask re-applied."""
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    for col, idx in (nan_at or {}).items():
        if len(idx) == 0:
            continue
        import pyarrow.compute as pc
        i = tbl.schema.get_field_index(col)
        arr = tbl.column(i).combine_chunks()
        null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False).copy()
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64).copy()
        vals[idx] = np.nan
        null_mask[idx] = False
        new = pa.array(vals, type=tbl.schema.field(i).type, mask=null_mask)
        tbl = tbl.set_column(i, tbl.schema.field(i), new)
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {len(df)} rows")


def _class_l(rng_l, vals, n, nan_frac, pinf_frac, ninf_frac, big_rows):
    """r12 trap class L: NON-FINITE / OUT-OF-DOMAIN measures in a float
    column.  Returns (new_vals, nan_idx): ±Inf, -0.0, and huge-but-finite
    magnitudes are set in the pandas frame (they survive from_pandas);
    TRUE NaN positions are returned for the _write arrow post-pass.
    All draws come from the caller's dedicated RandomState so classes
    A-K stay byte-identical."""
    v = vals.astype(np.float64).copy()
    finite = np.isfinite(v)  # don't confound class-C nulls (nan here)
    cand = np.where(finite)[0]
    rng_l.shuffle(cand)
    k_nan = max(2, int(n * nan_frac))
    k_pinf = max(1, int(n * pinf_frac))
    k_ninf = max(1, int(n * ninf_frac))
    pos = 0
    nan_idx = cand[pos:pos + k_nan]; pos += k_nan
    v[cand[pos:pos + k_pinf]] = np.inf; pos += k_pinf
    v[cand[pos:pos + k_ninf]] = -np.inf; pos += k_ninf
    # negative zero: distinct bits from class F's +0.0, equal under =
    k_nz = max(1, n // 500)
    v[cand[pos:pos + k_nz]] = -0.0; pos += k_nz
    # huge-but-finite: 1e308 (overflows DECIMAL(27,6) and doubles the
    # moment two are summed) and 1e22 (finite, castable nowhere in the
    # engine's declared measure domain) — magnitude garbage is as much
    # ingest corruption as clock garbage was for ts_domain
    for mag in big_rows:
        v[cand[pos:pos + 2]] = mag; pos += 2
    return v, nan_idx


def generate(base, out):
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(SEED)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        src = os.path.join(base, f"{name}.parquet")
        schema = pq.read_schema(src)
        df = pd.read_parquet(src)
        n = len(df)
        nan_at = {}  # class L: column -> true-NaN row indices (see _write)

        if name == "customer":
            df["c_acctbal"] = _nullf(
                rng, pd.Series(np.floor(df.c_acctbal / 500.0) * 500.0 + 0.0),
                0.03, n)
            df["c_mktsegment"] = _null(rng, df.c_mktsegment, 0.15, n)
            df["c_name"] = _uni(rng, df.c_name, 0.20, n)
        elif name == "supplier":
            df["s_acctbal"] = _nullf(
                rng, pd.Series(np.floor(df.s_acctbal / 500.0) * 500.0 + 0.0),
                0.03, n)
            df["s_name"] = _uni(rng, df.s_name, 0.10, n)
        elif name == "part":
            df["p_retailprice"] = _nullf(
                rng, pd.Series(
                    np.maximum(np.floor(df.p_retailprice / 100.0), 1.0)
                    * 100.0), 0.03, n)
            df["p_name"] = _null(rng, _uni(rng, df.p_name, 0.20, n), 0.05, n)
        elif name == "orders":
            hot = df.o_custkey.min()
            skew = rng.random_sample(n) < 0.30
            df.loc[skew, "o_custkey"] = hot
            # r9 class C2: null floods reach the money measures too
            df["o_totalprice"] = _nullf(
                rng, pd.Series(
                    np.maximum(np.floor(df.o_totalprice / 1000.0), 1.0)
                    * 1000.0), 0.03, n)
            tie_ts = df.o_orderdate.iloc[0].normalize()
            df.loc[rng.random_sample(n) < 0.35, "o_orderdate"] = tie_ts
            df["o_orderpriority"] = _null(rng, df.o_orderpriority, 0.10, n)
            # --- r12 trap class L: non-finite money (corrupt price feed)
            rng_l = np.random.RandomState(783)
            tp2, ord_nan = _class_l(rng_l, df.o_totalprice.to_numpy(), n,
                                    0.002, 0.001, 0.0005, (1e22,))
            df["o_totalprice"] = tp2
            nan_at["o_totalprice"] = ord_nan
        elif name == "lineitem":
            df.loc[rng.random_sample(n) < 0.25, "l_partkey"] = (
                df.l_partkey.min())
            df.loc[rng.random_sample(n) < 0.25, "l_suppkey"] = (
                df.l_suppkey.min())
            df["l_quantity"] = _nullf(rng, pd.Series(
                np.floor((df.l_quantity - 1.0) / 10.0) * 10.0 + 1.0),
                0.03, n)
            ep = np.maximum(np.floor(df.l_extendedprice / 500.0), 1.0) * 500.0
            fneg = rng.random_sample(n) < 0.03  # class F: refund lines
            df["l_extendedprice"] = _nullf(
                rng, pd.Series(np.where(fneg, -ep, ep)), 0.03, n)
            df["l_discount"] = _nullf(rng, pd.Series(
                np.where(df.l_discount < 0.04, 0.0, 0.05)), 0.03, n)
            df["l_tax"] = _nullf(rng, pd.Series(
                np.where(df.l_tax < 0.04, 0.0, 0.04)), 0.03, n)
            tie_ts = df.l_shipdate.iloc[0].normalize()
            df.loc[rng.random_sample(n) < 0.30, "l_shipdate"] = tie_ts
            # --- r12 trap class L: non-finite money (corrupt price feed)
            rng_l = np.random.RandomState(783)
            ep2, li_nan = _class_l(rng_l, df.l_extendedprice.to_numpy(), n,
                                   0.002, 0.0015, 0.0005, (1e308,))
            df["l_extendedprice"] = ep2
            nan_at["l_extendedprice"] = li_nan
        elif name == "events":
            # --- r9 trap class A: GAP DAYS / odd-length day series ---
            # Shift every event on three non-adjacent middle days onto the
            # following day (row count preserved): the day-grain series
            # now has calendar HOLES and an ODD number of observed days.
            # Recursive day-grain smoothers (holt / holt_winters /
            # decompose) must agree on observed-vs-calendar day policy,
            # and rank-select medians hit their odd-m branch (the
            # SKILL.md even-length-fixture trap) on the main fixture,
            # not just a test variant.
            day0 = df.ts.iloc[0].normalize()
            days = sorted(d for d in df.ts.dt.normalize().unique()
                          if d != day0)
            vacate = [days[i] for i in (9, 16, 22) if i < len(days)]
            dnorm = df.ts.dt.normalize()
            for vd in vacate:
                df.loc[dnorm == vd, "ts"] += pd.Timedelta(days=1)
            # --- r9 trap class B: VERSION-ORDER INVERSION ---
            # For ~20% of users, permute event_ids within the user so that
            # event_id order OPPOSES ts order (newest ts carries the
            # SMALLEST id).  Pristine data has event_id monotone with ts,
            # so a changelog consumer that versions by event_id alone (or
            # tiebreaks in the wrong direction) is vacuously green there;
            # here CDC latest-state / as-of joins diverge unless the
            # version really is (ts, event_id) lexicographic.
            users = np.sort(df.user_id.unique())
            inv_users = set(users[rng.random_sample(len(users)) < 0.20])
            eid = df.event_id.to_numpy().copy()
            ts_ns = df.ts.to_numpy()
            uid_arr = df.user_id.to_numpy()
            for u in inv_users:
                idx = np.where(uid_arr == u)[0]
                # rows sorted by (ts, event_id) asc get their own ids desc
                order = idx[np.lexsort((eid[idx], ts_ns[idx]))]
                eid[order] = np.sort(eid[idx])[::-1]
            df["event_id"] = eid
            tie_ts = df.ts.iloc[0].floor("h")
            df.loc[rng.random_sample(n) < 0.30, "ts"] = tie_ts
            hot_user = df.user_id.mode().iloc[0]
            df.loc[rng.random_sample(n) < 0.30, "user_id"] = hot_user
            # --- r9 trap class F: ZERO / NEGATIVE measures ---
            # The old `where(q <= 0, 0.01, q)` floor DODGED zeros; real
            # telemetry has idle-sensor zeros and refund negatives, and
            # first contact crashed the CLF byte-count mint (ANSI cast
            # of the unparseable negative token) and DuckDB's sqrt.
            q = np.round(df.value / 2.5) * 2.5
            v = np.where(q <= 0.0, 0.0, q) + 0.0
            fneg = rng.random_sample(n) < 0.04
            v = np.where(fneg, -np.abs(v) - 0.5, v)
            # r9 trap class C: NULL-MEASURE FLOOD — ~5% of value is null
            # (np.nan in the float frame; pyarrow writes parquet nulls).
            v[rng.random_sample(n) < 0.05] = np.nan
            df["value"] = v
            tie_props = rng.random_sample(n) < 0.20
            uni_props = (~tie_props) & (rng.random_sample(n) < 0.10)
            props = df.props.to_numpy(dtype=object).copy()
            props[tie_props] = '{"k": 7}'
            pick = rng.randint(0, len(UNI_WORDS), n)
            for i in np.where(uni_props)[0]:
                props[i] = '{"k": 7, "s": "%s"}' % UNI_WORDS[pick[i]]
            # --- r9 trap class E: JSON PATHOLOGIES in props ---
            # What 100 TB of logged JSON actually contains: malformed
            # docs, duplicate keys, numbers beyond int64, wrong-typed /
            # nested / bool values, trailing garbage, int64-overflow
            # squares.  The JSON queries' declared payload contract
            # (functions/scalar.py) must resolve every shape identically
            # in both engines; exotic-exponent doubles (>=1e16) are OUT
            # of the declared rendering contract and stay un-injected.
            patho = [
                '{"k": 6',                      # truncated
                '',                             # empty string
                'null',                         # bare JSON null
                'not json at all',              # garbage
                '{"k": 3, "k": 9}',             # duplicate key
                '{"a": 1, "a": 2, "k": 5}',     # duplicate OTHER key
                '{"k": 9223372036854775808}',   # 2^63, beyond int64
                '{"k": 6.9}', '{"k": -6.9}',    # non-integral doubles
                '{"k": {"a": 1}}',              # nested object
                '{"k": [1, 2]}',                # array value
                '{"k": "42"}', '{"k": "6.9"}',  # string-typed values
                '{"k": true}', '{"k": false}',  # booleans
                '{"j": 5}',                     # missing key entirely
                ' {"k": 5} trailing',           # trailing garbage
                '{"k": -3}',                    # negative integer
                '{"k": 4000000000}',            # k fits, k*k overflows
                '{"k": null}',                  # explicit JSON null
                # r10 advice additions — Jackson-lenient / yyjson-lenient
                # shapes the regex-only gate could not resolve (all must
                # resolve identically under the five-clause gate):
                '{"k": 1} {"x": 2}',            # trailing doc, ends in }
                '{"k": 1}}',                    # trailing brace junk
                '{"k": 5, "o": {"a": 1, "a": 2}}',  # NESTED duplicate key
                "{'k': 1}",                     # single-quoted (Jackson ok)
                '{"k": NaN}',                   # NaN token (yyjson ok)
                '{"k": 1,}',                    # trailing comma (yyjson ok)
                '{"a": "} {", "k": 8}',         # brace pair INSIDE string
                '{"k": 2, "s": "a\x01b"}',      # control char in string
                # r10 review additions (gate clauses 4 and 6):
                '{"k": nan}',                   # LOWERCASE nan (yyjson ok,
                                                # Jackson exact-case only)
                '{"k": Infinity}',              # Infinity token
                '{"a\\"b": 1, "k": 9}',         # escaped quote in a KEY
                                                # (crashed the variant
                                                # oracle's path walk)
                '{"k": "a\\"b"}',               # escaped quote in a value
                '{"k": "\\u0041"}',             # unicode escape
                # r11 ADVICE fix pins — the anchored NaN/Inf clause must
                # SPARE ordinary string contents/keys (all four usable;
                # the substring-form gate wrongly nulled them) while the
                # value-position anchors ',' and '[' still REJECT bare
                # tokens inside arrays:
                '{"note": "info", "k": 7}',     # 'inf' inside a string
                '{"fruit": "banana"}',          # 'nan' inside a string
                '{"k": "nan"}',                 # quoted nan IS the value
                '{"infinity": 3, "k": 2}',      # token as a KEY name
                '{"k": [1, NaN]}',              # bare NaN after ','
                '{"k": [Infinity]}',            # bare Infinity after '['
            ]
            patho_mask = ((~tie_props) & (~uni_props)
                          & (rng.random_sample(n) < 0.12))
            ppick = rng.randint(0, len(patho), n)
            # First cycle through EVERY shape once before random picks: a
            # uniform draw leaves ~e^-(rows/shapes) of the shapes with zero
            # occurrences (at sf0.001 two shapes never fired — a vacuous
            # pin, the q_llm_pii_redact lesson); the cycle guarantees each
            # shape appears at every density while the rng stream (and so
            # every downstream column's draw) is unchanged.
            for k, i in enumerate(np.where(patho_mask)[0]):
                props[i] = patho[k if k < len(patho) else ppick[i]]
            df["props"] = props
            # --- r9 trap class G: NULL ENTITY/CATEGORY KEYS ---
            df["event_type"] = _null(rng, df.event_type, 0.04, n)
            uid = df.user_id.to_numpy(dtype=float).copy()
            uid[rng.random_sample(n) < 0.03] = np.nan  # anonymous events
            df["user_id"] = uid
            # --- r10 trap class H: TIME PATHOLOGIES ---
            # ts was the last fixture column never made hostile.  Real
            # century-scale logs contain clock-reset epoch garbage,
            # misconfigured far-future stamps, and bursts so dense that
            # MANY events share one microsecond — the window tiebreakers'
            # real enemy (an ORDER BY ts without the unique event_id
            # tiebreak is nondeterministic in a microsecond storm), and
            # the ns->us conversion's sign semantics (Spark `div 1000`
            # vs DuckDB's parquet NANOS read) only differ pre-epoch /
            # sub-microsecond.
            hp = rng.random_sample(n)
            ts_vals = df.ts.copy()
            ts_vals[hp < 0.002] = pd.Timestamp("1970-01-01 00:00:00")
            ts_vals[(hp >= 0.002) & (hp < 0.0035)] = pd.Timestamp(
                "1969-12-31 23:59:59.999999")       # -1 us, exact
            ts_vals[(hp >= 0.0035) & (hp < 0.004)] = pd.Timestamp(
                "1969-12-31 23:59:59.999999750")    # -250 ns, sub-us
            ts_vals[(hp >= 0.004) & (hp < 0.0045)] = pd.Timestamp(
                "1970-01-01 00:00:00.000000250")    # +250 ns, sub-us
            ts_vals[(hp >= 0.0045) & (hp < 0.006)] = pd.Timestamp(
                "2200-06-15 12:00:00")              # far future (in ns range)
            # microsecond tie-storm: ~8% of events collapse onto ONE
            # instant with only 0/1/2-us offsets between them
            storm = (hp >= 0.006) & (hp < 0.086)
            storm_base = df.ts.iloc[0].floor("h") + pd.Timedelta(minutes=7)
            storm_off = pd.to_timedelta(rng.randint(0, 3, n), unit="us")
            ts_vals[storm] = (storm_base + storm_off)[storm]
            df["ts"] = ts_vals
            # --- r11 trap class I: NULL TIMESTAMPS ---
            # Independent RandomState: the class A-H draws above and the
            # documents/embeddings streams below stay byte-identical to
            # the r10 fixtures; class I composes on top.
            rng_i = np.random.RandomState(779)
            ts2 = df.ts.copy()
            ts2[rng_i.random_sample(n) < 0.015] = pd.NaT
            df["ts"] = ts2
            # --- r12 trap class J: CONTENT PATHOLOGIES in props ---
            # Independent RandomState(781); overwrites ride on top of
            # whatever class E left in the slot (composition, the
            # "always re-sweep the combined fixture" lesson).  All three
            # shapes are USABLE under the payload contract (top-level
            # integral k, no bare NaN/Inf in value position) — the trap
            # is depth, width, and bait-in-string, not malformedness.
            rng_j = np.random.RandomState(781)
            props = df.props.to_numpy(dtype=object).copy()
            deep = ('{"k": 3, "d": ' + '{"x": ' * 31
                    + '{"dup": 1, "dup": 2, "y": ' + '{"x": ' * 31
                    + '7' + '}' * 63 + '}')
            wide = '{"k": 2, "a": [%s]}' % ",".join(
                str(i % 7) for i in range(1000))
            bait_s = ('GET /a HTT ' * 700 + 'x' * 4000
                      + ' 1' * 2000).replace('/', '_')
            big_str = '{"k": 4, "s": "%s"}' % bait_s
            jshapes = [deep, wide, big_str]
            jmask = np.where(rng_j.random_sample(n) < 0.01)[0]
            for k, i in enumerate(jmask):
                props[i] = jshapes[k % len(jshapes)]
            df["props"] = props
            # --- r12 trap class L: NON-FINITE MEASURES in events.value ---
            # True NaN (via the _write arrow post-pass), ±Inf, -0.0,
            # 1e308 / 1e22 magnitude garbage.  A sensor that divides by
            # zero or bit-flips ships exactly this at 100 TB scale, and
            # eleven rounds of "NaN" fixtures never actually contained
            # one (pandas NaN -> parquet NULL).  RandomState(783) keeps
            # classes A-K byte-identical.
            rng_l = np.random.RandomState(783)
            v2, ev_nan = _class_l(rng_l, df.value.to_numpy(), n,
                                  0.004, 0.0025, 0.001, (1e308, 1e22))
            df["value"] = v2
            nan_at["value"] = ev_nan
        elif name == "documents":
            # duplicate storm: 30 anchor texts, each copied onto 2 other
            # docs (ids stay unique; lang/source untouched -> groups span
            # sources, the shape exact/near dedup must collapse).
            n_grp = min(90, max(3, (n * 18) // 100))  # scales to tiny SFs
            ids = rng.choice(n, size=n_grp, replace=False)
            anchors, copies = ids[:n_grp // 3], ids[n_grp // 3:]
            text = df.text.to_numpy(dtype=object).copy()
            for j, c in enumerate(copies):
                text[c] = text[anchors[j % len(anchors)]]
            uni = rng.random_sample(n) < 0.25
            lead = (~uni) & (rng.random_sample(n) < 0.10)
            pick = rng.randint(0, len(UNI_WORDS), n)
            for i in np.where(uni)[0]:
                text[i] = f"{text[i]} {UNI_WORDS[pick[i]]}"
            for i in np.where(lead)[0]:
                # LEADING unicode: the first codepoint is multi-byte, so
                # first-byte vs first-char arithmetic (payload height,
                # prefix hashes) diverges unless the query's convention
                # really is byte==codepoint safe.
                text[i] = f"{UNI_WORDS[pick[i]]} {text[i]}"
            # degenerate documents: empty text, double-space (an EMPTY
            # token from split-on-space), and one giant unbroken token —
            # the tokenizer / per-token-count-division / shingle edge
            # cases (ANSI divide-by-zero bait).  Kept off the dup-storm
            # ids so the exact-dup groups stay intact.
            degen = rng.choice(n, size=max(3, n // 33), replace=False)
            degen = [i for i in degen if i not in set(ids)]
            for j, i in enumerate(degen):
                if j % 3 == 0:
                    text[i] = ""
                elif j % 3 == 1:
                    text[i] = text[i].replace(" ", "  ", 1)
                else:
                    text[i] = "x" * 300
            # --- r12 trap class J: CONTENT PATHOLOGIES ---
            # Independent RandomState(781) keeps classes A-I untouched;
            # rows drawn disjointly from the dup-storm ids so exact-dup
            # groups stay intact (the degen discipline).
            rng_j = np.random.RandomState(781)
            taken = set(ids)
            jpool = [i for i in rng_j.choice(n, size=min(n, 16 + n // 25),
                                             replace=False)
                     if i not in taken]
            # J1 — multi-megabyte documents, FIXED count per density
            # (fraction-scaling would put 400x2MB in the sf0.1 fixture):
            # repeated prose with a per-doc salt token every sentence so
            # the big docs are neither exact nor near duplicates of each
            # other, plus one digit run and one unicode word so the
            # token-shape extractors fire inside the megabytes.
            sent = ("the quick brown fox jumps over the lazy dog 12345 "
                    "while zephyrs vex a daft jumbled sphinx quartz 67 ")
            n_big = min(4, len(jpool))
            for j in range(n_big):
                reps = 12000 + 6000 * j          # ~1.1 MB .. ~2.8 MB
                text[jpool[j]] = "".join(
                    f"{sent}salt{j}x{r % 97} " for r in range(reps))
            # J2 — whitespace-only documents: ASCII runs and unicode
            # whitespace (NBSP, EM SPACE, IDEOGRAPHIC SPACE).  split-on-
            # ' ' sees empty tokens or one giant "token" of 　s where
            # a unicode-aware tokenizer sees nothing — the policy seam.
            ws_shapes = [" " * 120, "\t\n \t\n  ", " " * 40,
                         "   　　", "\n\n\n\n"]
            j2 = jpool[n_big:n_big + max(4, len(jpool) // 4)]
            for j, i in enumerate(j2):
                text[i] = ws_shapes[j % len(ws_shapes)]
            # J3 — regex bait: long runs of near-matching prefixes (the
            # CLF verb shape 'GET <tok> HTT…' that never completes), a
            # 100k single token, an 'ab'*k+'c' run, and a long digit run
            # — quadratic-scan bait for backtracking engines (RE2 stays
            # linear), plus the {10,}/{4,} token-shape extractors' worst
            # case.
            bait_shapes = [
                "GET /x HTT " * 4000,
                "a" * 100000 + "!",
                "ab" * 30000 + "c",
                "7" * 50000 + " end",
            ]
            j3 = j2_rest = jpool[n_big + len(j2):]
            j3 = j2_rest[:max(4, len(j2_rest) // 2)]
            for j, i in enumerate(j3):
                text[i] = bait_shapes[j % len(bait_shapes)]
            # J4 — astral-plane + combining-character storms: ZWJ emoji
            # families (7 codepoints, 25 UTF-8 bytes, ONE grapheme),
            # astral math letters, 12-deep combining stacks — aimed at
            # the byte-vs-codepoint seams (payload height arithmetic,
            # prefix hashes, printable-ASCII projections).
            fam = "\U0001f469‍\U0001f469‍\U0001f467‍\U0001f466"
            stack = "e" + "́̀̂̈̃̄̆" \
                          "̇̉̊̋̌"
            astral = "\U0001d51e\U0001d51f\U0001d520 "
            j4 = j2_rest[len(j3):]
            for j, i in enumerate(j4):
                unit = [fam + " ", stack + " ", astral][j % 3]
                text[i] = unit * 400
            df["text"] = text
            df["n_chars"] = [len(t) for t in text]
            # r9 class G: untagged documents
            df["lang"] = _null(rng, df.lang, 0.04, n)
            df["source"] = _null(rng, df.source, 0.04, n)
        elif name == "embeddings":
            vecs = [np.asarray(v, dtype=np.float32) for v in df.embedding]
            vecs = [np.round(v * 4.0) / 4.0 for v in vecs]
            # (quantization CAN zero a vector — that used to be dodged with
            # a stub; since the r9 validity contract it is a welcome trap)
            n_pair = min(20, max(2, n // 12))
            ids = rng.choice(n, size=2 * n_pair, replace=False)
            for j in range(n_pair):  # identical pairs -> cosine ties
                vecs[ids[n_pair + j]] = vecs[ids[j]].copy()
            # --- r9 trap class D: VECTOR PATHOLOGIES ---
            # Failed/partial encoder output: all-zero vectors (~4%), a NULL
            # component (~3%; np.nan becomes a parquet NULL through
            # pyarrow), a +Inf component (~1%).  All three violate the
            # vector family's validity contract (llm/similarity.py
            # `vec_valid`) and must be EXCLUDED identically by both
            # engines; unguarded cosine paths crash (ANSI DIVIDE_BY_ZERO /
            # DuckDB list_cosine_similarity NULL rejection) or diverge.
            dim = len(vecs[0])
            n_zero = max(2, n * 4 // 100)
            n_null = max(2, n * 3 // 100)
            n_inf = max(1, n // 100)
            bad = rng.choice(n, size=n_zero + n_null + n_inf, replace=False)
            for i in bad[:n_zero]:
                vecs[i] = np.zeros(dim, dtype=np.float32)
            for j, i in enumerate(bad[n_zero:n_zero + n_null]):
                vecs[i] = vecs[i].copy()
                vecs[i][j % dim] = np.float32("nan")  # -> parquet NULL
            for j, i in enumerate(bad[n_zero + n_null:]):
                vecs[i] = vecs[i].copy()
                vecs[i][j % dim] = np.float32("inf")
            df["embedding"] = [v.astype(np.float32) for v in vecs]
            # r9 class G: unlabeled embeddings
            lab = df.label.to_numpy(dtype=float).copy()
            lab[rng.random_sample(n) < 0.05] = np.nan
            df["label"] = lab

        _write(out, name, df, schema, nan_at=nan_at)
    print(f"adversarial fixtures written to {out}")


if __name__ == "__main__":
    generate(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
             sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv")
