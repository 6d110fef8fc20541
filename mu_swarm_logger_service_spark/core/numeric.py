"""Cross-engine deterministic numeric aggregation helpers.

Floating-point SUM/AVG is order-dependent, and Spark's shuffle order is
nondeterministic — so a double sum can differ in the last ulp between Spark
and the DuckDB oracle (SURVEY.md §7 hard-things list).  The fix: do per-row
arithmetic in DOUBLE (deterministic: same input bits, same operator order in
both engines), cast each row result to DECIMAL (exact, associative), SUM the
decimals (order-independent), and cast the final value back to DOUBLE.

Tie-safety note: decimal cast rounding ties ARE representable doubles —
any odd multiple of 5·10^-(scale+1) whose factors of 5 fully cancel is
binary-exact (0.0078125 = 2^-7 is a 6-dp tie; 0.125 a 2-dp one) — but
parity holds because both engines break double→decimal ties half AWAY from
zero (Spark HALF_UP, DuckDB likewise).  A round-half-even path on either
side would be the real hazard (round-6 advice corrected the earlier
"ties impossible" claim here and in operators/analytics.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Row values up to ~1e20 with 6 exact decimal digits; SUM widens precision.
DEC = "decimal(27,6)"


def dsum(col: Column) -> Column:
    """Order-independent SUM of a double column (exact decimal internally)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal SUM / COUNT, divided as double."""
    return dsum(col) / F.count(col)


def dsum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"{dsum_sql(expr)} / COUNT({expr})"
