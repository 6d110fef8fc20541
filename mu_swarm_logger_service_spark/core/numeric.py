"""Cross-engine deterministic numeric aggregation helpers.

Floating-point SUM/AVG is order-dependent, and Spark's shuffle order is
nondeterministic — so a double sum can differ in the last ulp between Spark
and the DuckDB oracle (SURVEY.md §7 hard-things list).  The fix: do per-row
arithmetic in DOUBLE (deterministic: same input bits, same operator order in
both engines), cast each row result to DECIMAL (exact, associative), SUM the
decimals (order-independent), and cast the final value back to DOUBLE.

Tie-safety note (corrected round 7, measured): the engines do NOT round a
double→decimal cast the same way when the cast actually has to round.
Spark casts via ``BigDecimal.valueOf`` — it rounds the SHORTEST-REPR
STRING of the double, HALF_UP — while DuckDB rounds the BINARY value.
They diverge whenever the shortest repr terminates at the tie digit but
the binary value is not an exact tie (measured: a product with repr
10068433.305 → Spark .31, DuckDB .30 — the q_ts_cross_corr first build).
The actual safety invariant of this module is therefore EXACTNESS, not
tie-agreement: every double cast to DECIMAL here must carry at most
``scale`` decimal digits so the cast never rounds at all.  Fixture
inputs satisfy this (prices/values/discounts have ≤2 decimals, scale is
6); derived values must be checked — a product of two 6-dp-exact doubles
carries up to 12 decimal digits and is NOT safe to cast at scale 6
(floor/quantize it first, as q_ts_cross_corr does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Row values up to ~1e20 with 6 exact decimal digits; SUM widens precision.
DEC = "decimal(27,6)"

# ---------------------------------------------------------------------------
# Measure-domain contract (r12 hostile trap class L: non-finite measures).
#
# A NaN, ±Inf, or magnitude-garbage double (1e308 from a bit flip, 1e22
# from a unit blunder) is ingest corruption, not a measure: one such row
# must not crash a 100 TB revenue rollup.  Without this gate it does —
# BOTH engines raise casting a non-finite double to DECIMAL (Spark ANSI
# NUMERIC_VALUE_OUT_OF_RANGE, DuckDB Invalid Input / Conversion Error),
# so the first corrupt sensor reading aborts every decimal-path aggregate.
# The declared domain is exactly the decimal path's representable range,
# |v| < 1e21 = DECIMAL(27,6)'s integral capacity; out-of-domain values are
# MISSING (NULL), which hands them to the existing observed-measures
# policy family (class C/C2) — row counts never change, only the value is
# quarantined.  The predicate abs(v) < 1e21 needs no isnan/isfinite
# special-casing on either engine: both order NaN greater than every
# other value, so NaN and ±Inf fail the comparison identically (measured
# on nine shapes — NaN/±Inf/NULL/1e308/1e22/-0.0/9.9e20 agree
# bit-for-bit across engines).  This is the measure-axis member of the
# ingest-validation family: vec_valid (class D) quarantines broken
# embeddings, ts_domain (class H) quarantines clock garbage, and
# measure() quarantines magnitude/finiteness garbage.
MEASURE_MAX = 1e21


def in_measure_domain(col: Column) -> Column:
    """True iff the double is a usable measure (finite, |v| < 1e21)."""
    return F.abs(col) < F.lit(MEASURE_MAX)


def measure(col: Column) -> Column:
    """Nullify out-of-domain doubles (NaN/±Inf/magnitude garbage -> NULL)."""
    return F.when(in_measure_domain(col), col)


def measure_sql(expr: str) -> str:
    """DuckDB mirror of :func:`measure`."""
    return f"CASE WHEN abs({expr}) < 1e21 THEN ({expr}) END"


def dsum(col: Column) -> Column:
    """Order-independent SUM of a double column (exact decimal internally).

    Gated by the measure-domain contract: out-of-domain rows contribute
    NULL (skipped by SUM) instead of crashing the decimal cast."""
    return F.sum(measure(col).cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal SUM / COUNT, divided as double.

    COUNT is over in-domain values only, so avg = sum/count is the mean
    of exactly the values the sum admitted."""
    return dsum(col) / F.count(measure(col))


def dsum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return (f"CAST(SUM(CAST(({measure_sql(expr)}) AS DECIMAL(27,6))) "
            f"AS DOUBLE)")


def davg_sql(expr: str) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"{dsum_sql(expr)} / COUNT({measure_sql(expr)})"


def epoch_s(col: Column | str) -> Column:
    """Sign-safe epoch SECONDS: ``floor(unix_micros(ts) / 1e6)`` — the
    Spark twin of the oracles' ``CAST(floor(epoch(ts)) AS BIGINT)``.

    ``F.unix_timestamp`` TRUNCATES sub-second time toward zero while
    DuckDB's ``epoch()`` + ``floor`` floors — they agree only for
    non-negative epochs.  The r10 class-H fixture (pre-epoch clock
    garbage, -1 µs stamps) split six queries on exactly this:
    unix_timestamp(-1 µs) = 0 vs floor(epoch) = -1.  Both engines here
    perform the SAME two IEEE ops on the same int64: the identical
    int64→double conversion (correctly rounded — exact below 2^53 µs,
    ~year 2255, and the SAME rounded double above it), one
    correctly-rounded division on identical bits, and floor of identical
    doubles.  The agreement argument is bit-identical rounding, not
    exactness, so the pair matches for any representable timestamp,
    either sign (r10 advice corrected the earlier "exact through 2262"
    overstatement — int64 µs itself runs to 2262, 2^53 only to ~2255)."""
    return F.floor(F.unix_micros(col) / F.lit(1_000_000.0)).cast("long")
