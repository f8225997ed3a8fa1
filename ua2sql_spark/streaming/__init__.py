"""Structured Streaming: the reference's incremental consumer, Spark-native."""

from ua2sql_spark.streaming.ingest import stream_feed  # noqa: F401
