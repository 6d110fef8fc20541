"""Engine introspection — the information_schema of the query surface.

A user switching from the reference needs to DISCOVER the API, not read
source: q_meta_catalog exposes the full registry (every query, its family,
implementing module, and check tier) as a queryable DataFrame — the
engine's `SHOW TABLES`.  Its oracle SQL is a VALUES literal generated from
the SAME registry AFTER all modules have registered (injected by the
package __init__, since a decorator-time oracle would snapshot a
half-imported registry).
"""

from __future__ import annotations

import inspect

from pyspark.sql import DataFrame, SparkSession

from .registry import ORACLE, QUERIES, query

_PKG = "mu_swarm_logger_service_spark"


def catalog_rows() -> list[tuple[str, str, str, bool]]:
    """(name, family, module, exact_oracle) per registered query, sorted —
    the single source for BOTH sides of the q_meta_catalog oracle pair."""
    rows = []
    for name, fn in QUERIES.items():
        mod = inspect.getmodule(fn)
        rows.append((
            name,
            name.split("_")[1],
            (mod.__name__ if mod else "?").replace(_PKG + ".", ""),
            name in ORACLE or name == "q_meta_catalog",
        ))
    return sorted(rows)


def catalog_oracle_sql() -> str:
    vals = ",\n".join(
        f"('{n}', '{fam}', '{mod}', {'true' if ex else 'false'})"
        for n, fam, mod, ex in catalog_rows()
    )
    return ("SELECT * FROM (VALUES %s) AS t(name, family, module, "
            "exact_oracle)" % vals)


@query("q_meta_catalog")  # oracle injected post-import by the package root
def q_meta_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query catalog as a DataFrame (name, family, module,
    exact_oracle).  Registry metadata, not data — a few hundred rows built
    driver-side by design; the parity check proves the EXPORTED surface
    and the documented surface are the same object (a drifted COVERAGE
    table cannot pass this gate)."""
    return spark.createDataFrame(
        catalog_rows(),
        "name string, family string, module string, exact_oracle boolean",
    )
