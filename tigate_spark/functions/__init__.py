from tigate_spark.functions.phash import h32, h32_sql, h60, h60_sql

__all__ = ["h32", "h32_sql", "h60", "h60_sql"]
