"""Structured Streaming changefeed runtime (SURVEY §3, §7.2 M4/M5).

The reference is a streaming CDC engine; this package is its Spark-native
shape: ``readStream → normalize → filter/project → route/encode →
foreachBatch sink``, with Spark checkpointing subsuming tigate's
seq/handshake protocol (T10) and micro-batch boundaries providing the DDL
barrier (T8).
"""
