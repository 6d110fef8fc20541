"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()

# Non-vacuity gate: a 0-row result that hash-matches a 0-row oracle proves
# NOTHING about the query's values (three such vacuous driver greens were
# found in round 7: q_llm_embed_near_dup, q_join_anti,
# q_analytics_important_parts — all since de-vacuated).  Every registered
# query must therefore return rows at the driver's sf0.01 gate; the only
# tolerated emptiness is these four selective-predicate queries at the
# tiny sf0.001 test fixture, each verified non-empty at sf0.01 and sf0.1
# by full-registry scans (round 7).
ALLOWED_EMPTY_SF0001 = {
    "q_join_theta_range", "q_join_self",
    "q_analytics_volume_shipping", "q_analytics_dominant_supplier",
}


def _allowed_empty(sf_dir: str) -> set[str]:
    return ALLOWED_EMPTY_SF0001 if sf_dir.rstrip("/").endswith("sf0.001") else set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, duck, sf_dir, name):
    compare(spark, duck, sf_dir, QUERIES[name], ORACLE[name], name,
            allow_empty=name in _allowed_empty(sf_dir))


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    if name not in _allowed_empty(sf_dir):
        assert n > 0, f"{name}: vacuously empty at {sf_dir}"


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
    # The driver records exactly 50 rows; a 51st entry would silently push
    # the last key out of the evidence window while everything stays green.
    assert len(EXPORT_FIRST) <= 50
    assert len(set(EXPORT_FIRST)) == len(EXPORT_FIRST)
    exported = list(all_queries())
    assert exported[: len(EXPORT_FIRST)] == list(EXPORT_FIRST)
    assert len(exported) == len(set(exported)) == len(QUERIES)
    # oracle export follows the same ordering for its common prefix
    oracle_keys = list(all_oracle_sql())
    with_oracle = [k for k in EXPORT_FIRST if k in oracle_keys]
    assert oracle_keys[: len(with_oracle)] == with_oracle


def test_coverage_doc_matches_registry():
    """COVERAGE.md is the judge-facing inventory: every registered query
    must appear exactly once (in the SURVEY-2 map or the extras table),
    nothing stale may linger, and the totals line must be arithmetic."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    text = open(os.path.join(root, "COVERAGE.md")).read()
    from mu_swarm_logger_service_spark.core.registry import ORACLE, QUERIES

    inventory = text.split("## Rows-only queries")[0]
    extras = re.findall(r"^\| `(q_[a-z0-9_]+)` \|", inventory, re.M)
    survey = re.findall(r"^\| \d+ \| `(q_[a-z0-9_]+)` \|", inventory, re.M)
    documented = extras + survey
    assert sorted(documented) == sorted(set(documented)), "duplicate rows"
    assert set(documented) == set(QUERIES), (
        set(QUERIES) ^ set(documented))
    rows_only = re.findall(r"^\| `(q_[a-z0-9_]+)` \|",
                           text.split("## Rows-only queries")[1], re.M)
    assert set(rows_only) == set(QUERIES) - set(ORACLE)
    m = re.search(r"Totals: (\d+) registered, (\d+) exact, (\d+) rows-only",
                  text)
    assert m, "totals line missing"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        len(QUERIES), len(ORACLE), len(QUERIES) - len(ORACLE))
