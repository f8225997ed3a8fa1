"""JobId checkpoint protocol — parity with the reference's offset log.

The reference tracks per-feed resume points in a ``JobId`` table
(ua2sql.py:39-44): ``find_previous_job_id`` reads the most recent jobId
for a jobType via SELECT … ORDER BY ts DESC LIMIT 1 (ua2sql.py:165-176),
and one row is appended after each successful ingest (ua2sql.py:278) —
*after* the insert commits, giving at-least-once delivery (SURVEY §2.9
T4).

Here the log is an append-only parquet directory (swap for a JDBC table
with identical semantics when PG parity is required). The lookup is
``max_by(jobId, ts)`` — the distributed form of ORDER BY ts DESC LIMIT 1
that never sorts more than one partial aggregate per partition.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),       # ua2sql.py:41
        StructField("jobId", StringType()),       # ua2sql.py:42
        StructField("jobType", StringType()),     # ua2sql.py:43
    ]
)


class JobIdCheckpoint:
    """Append-only (ts, jobId, jobType) log with latest-per-type lookup."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            name.endswith(".parquet") for name in os.listdir(self.path)
        )

    def find_previous_job_id(self, job_type: str) -> str | None:
        """Latest jobId for ``job_type`` (reference ua2sql.py:165-176).
        Ties on ts break toward the lexicographically larger jobId so the
        answer is deterministic."""
        if not self._exists():
            return None
        df = self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)
        row = (
            df.filter(F.col("jobType") == job_type)
            .agg(F.max_by("jobId", F.struct(F.col("ts"), F.col("jobId"))).alias("jobId"))
            .collect()[0]
        )
        return row["jobId"]

    def append(self, job_id: str, job_type: str, ts: datetime | None = None) -> None:
        """Record a completed ingest (reference ua2sql.py:278). Call only
        after the sink write succeeds — checkpoint-after-commit is the
        at-least-once contract (ua2sql.py:274-278)."""
        ts = ts or datetime.now(timezone.utc).replace(tzinfo=None)
        df = self.spark.createDataFrame([(ts, job_id, job_type)], CHECKPOINT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)
