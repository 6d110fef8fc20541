"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, duck, sf_dir, name):
    compare(spark, duck, sf_dir, QUERIES[name], ORACLE[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_export_window_is_complete_and_first():
    """The driver records CORRECTNESS rows for the first 50 exported keys
    only.  Every EXPORT_FIRST key must actually be registered (a renamed
    query would otherwise silently fall out of the driver's evidence
    window — _export_order skips unknown keys by design), and the export
    order must really lead with them."""
    from mu_swarm_logger_service_spark.core.registry import (
        EXPORT_FIRST, QUERIES, all_oracle_sql, all_queries)

    missing = [k for k in EXPORT_FIRST if k not in QUERIES]
    assert not missing, f"EXPORT_FIRST names unregistered keys: {missing}"
    exported = list(all_queries())
    assert exported[: len(EXPORT_FIRST)] == list(EXPORT_FIRST)
    assert len(exported) == len(set(exported)) == len(QUERIES)
    # oracle export follows the same ordering for its common prefix
    oracle_keys = list(all_oracle_sql())
    with_oracle = [k for k in EXPORT_FIRST if k in oracle_keys]
    assert oracle_keys[: len(with_oracle)] == with_oracle
