from .registry import ORACLE, QUERIES, all_oracle_sql, all_queries, query
from .session import get_spark
from .tables import BROADCAST_DIMS, TABLES, load

__all__ = [
    "ORACLE", "QUERIES", "all_oracle_sql", "all_queries", "query",
    "get_spark", "BROADCAST_DIMS", "TABLES", "load",
]
