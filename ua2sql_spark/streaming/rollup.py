"""Incremental aggregate maintenance (hypertable-rollup-style).

The reference lands raw events and delegates all aggregation to
PostgreSQL (README.md:2,28). At 100 TB the standing aggregates a
dashboard needs (events per day × type, revenue per day × platform)
cannot be recomputed from raw history on every refresh — they must be
maintained *incrementally* as data streams in.

Design (the 100 TB argument):

* Each micro-batch is reduced to **partial aggregates** first —
  (day, key) → (count, decimal sum) — so the merge step sees at most
  |touched days × keys| rows regardless of batch size. Counts and
  decimal sums are commutative monoids, so merging partials is exact
  (same decimal-interior policy as ``queries/common.py``).
* The rollup table is parquet **partitioned by day**. A micro-batch
  only reads back and rewrites the day-partitions it touches
  (``partitionOverwriteMode=dynamic``): a day's worth of late events
  rewrites one partition, never the table. State lives in the table
  itself — the streaming query carries no aggregation state, so this
  composes with ``Trigger.AvailableNow`` run-once scheduling exactly
  like the reference's daily cron (README.md:30).
* Exactly-once: the merge is idempotent only per-epoch, so the sink is
  at-least-once under epoch replay (same contract as the reference's
  checkpoint-after-commit, ua2sql.py:274-278). The upgrade is the same
  as for JDBC: stage epoch ids in the table and skip replayed epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

DEC = "decimal(28,8)"


def _partial(batch: DataFrame, ts_col: str, key_col: str, val_col: str) -> DataFrame:
    return (
        batch.withColumn("day", F.to_date(ts_col))
        .groupBy("day", F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(val_col).cast(DEC)).alias("sum_value"),
        )
    )


def merge_rollup(
    spark: SparkSession,
    partial: DataFrame,
    rollup_path: str,
) -> None:
    """Merge one batch's partial aggregates into the day-partitioned
    rollup table, rewriting only the touched day-partitions."""
    days = [r["day"] for r in partial.select("day").distinct().collect()]
    if not days:
        return
    try:
        existing = spark.read.parquet(rollup_path).filter(F.col("day").isin(days))
    except AnalysisException as exc:
        # ONLY a missing table means "first batch". Any other failure
        # (corrupt footer, permissions, transient FS error) must
        # propagate: treating it as absent would overwrite the touched
        # day partitions with this batch's partials alone, silently
        # discarding every previously accumulated aggregate for them.
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        existing = None
    merged = partial
    if existing is not None:
        merged = (
            partial.unionByName(existing)
            .groupBy("day", "key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    (
        merged.coalesce(1)  # a day×key rollup partition is tiny by construction
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_path)
    )


def rollup_sink(
    rollup_path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
):
    """``foreachBatch`` closure maintaining the rollup incrementally."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        merge_rollup(
            batch.sparkSession,
            _partial(batch, ts_col, key_col, val_col),
            rollup_path,
        )

    return sink


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The query side: exact totals per (day, key) with the decimal sum
    surfaced as double (single deterministic rounding)."""
    return spark.read.parquet(rollup_path).select(
        "day",
        "key",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )
