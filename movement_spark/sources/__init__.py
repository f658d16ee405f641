from movement_spark.sources.tables import TABLES, load_table, register_duckdb_views
from movement_spark.sources.tokens import (
    TOKEN_SEQ_DUCKDB_CTE,
    token_sequences,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_duckdb_views",
    "TOKEN_SEQ_DUCKDB_CTE",
    "token_sequences",
]
