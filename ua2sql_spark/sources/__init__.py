"""Sources & sinks: Unity-format ingest parity (reference ua2sql.py) on Spark."""

from ua2sql_spark.sources.unity import (  # noqa: F401
    FEEDS,
    landed_schema,
    raw_schema,
    read_feed,
    normalize_feed,
)
from ua2sql_spark.sources.checkpoint import JobIdCheckpoint  # noqa: F401
from ua2sql_spark.sources.jdbc import jdbc_writer_options, write_feed_jdbc  # noqa: F401
