"""tigate_spark — a PySpark-native CDC/analytics engine.

A ground-up re-expression of the capabilities of flowbehappy/tigate
(new-architecture TiCDC, reference snapshot at /root/reference) on top of
the Spark DataFrame / Catalyst / Structured Streaming stack, extended with
the LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB training-data pipeline needs.

Design rules (see SURVEY.md):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/reorder.
- Built-in pyspark.sql.functions in the hot path; pandas UDFs only where
  semantics genuinely require Python; no row-at-a-time Python UDFs.
- Every operator is registered in ``tigate_spark.catalog`` with a DuckDB
  oracle so correctness is machine-checkable.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports: keep `import tigate_spark` cheap (no pyspark import)
    if name in ("ChangefeedConfig", "FilterConfig", "EventFilterRule",
                "SinkConfig", "DispatchRule", "ColumnSelector"):
        from tigate_spark import config
        return getattr(config, name)
    if name == "Engine":
        from tigate_spark.engine import Engine
        return Engine
    if name == "Changefeed":
        from tigate_spark.streaming.changefeed import Changefeed
        return Changefeed
    if name == "get_catalog":
        from tigate_spark.catalog import get_catalog
        return get_catalog
    raise AttributeError(name)
