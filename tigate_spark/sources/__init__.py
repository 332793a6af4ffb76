from tigate_spark.sources.batch import TABLES, load_table, load_tables
from tigate_spark.sources.changes import changes_stream, ORACLE_CHANGES_CTE

__all__ = ["TABLES", "load_table", "load_tables", "changes_stream", "ORACLE_CHANGES_CTE"]
