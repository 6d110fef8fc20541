"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here with an optional
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports these dicts.

Design: a query is a pure function ``(spark, sf_dir) -> DataFrame``.  The
oracle SQL must produce identical column names (the driver sorts columns by
name before hashing values) and deterministic values.  Determinism rules
(SURVEY.md §7 hard-things list):

- float aggregates: cast to DECIMAL before SUM (exact, order-independent),
  cast back to DOUBLE after — both engines then agree bit-for-bit;
- timestamps: session TZ pinned to UTC; ``events.ts`` is ns → compare at µs;
- nondeterministic ops (uuid, rand, sampling, approx, LSH): register with
  ``oracle=None`` → driver runs a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and its DuckDB oracle SQL, if exact)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
