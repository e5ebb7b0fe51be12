from .catalog import all_queries, oracle_sql, queries, register  # noqa: F401
