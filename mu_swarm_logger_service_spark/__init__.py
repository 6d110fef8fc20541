"""mu_swarm_logger_service_spark — a PySpark-native log-analytics engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of `big-data-europe/mu-swarm-logger-service` (see SURVEY.md):
the reference's Docker-event/log ingestion dataflow re-expressed as
Structured Streaming, the SPARQL 1.1 query algebra it delegates to its
triplestore re-expressed as Spark SQL / DataFrame plans, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) — all designed for 100 TB scale.
"""

from .core import ORACLE, QUERIES, all_oracle_sql, all_queries, get_spark, load

# Import subpackages for their registration side effects.
from . import operators  # noqa: F401

for _pkg in ("functions", "streaming", "sources", "llm", "udx"):
    try:
        __import__(f"{__name__}.{_pkg}")
    except ImportError:
        pass

__all__ = ["ORACLE", "QUERIES", "all_oracle_sql", "all_queries", "get_spark", "load"]

# The catalog query's oracle must see the COMPLETE registry, so it is
# generated and injected here — after every subpackage has registered —
# rather than at decorator time (core/meta.py explains).
from .core import meta as _meta  # noqa: E402  (registers q_meta_catalog)

ORACLE["q_meta_catalog"] = _meta.catalog_oracle_sql()
