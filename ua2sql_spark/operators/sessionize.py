"""Gap-based sessionization (SURVEY §2.9 T9 batch path, §2.11 X7).

lag → new-session flag → running sum: two window passes over one
shuffle by user. No state, no UDF; at 100 TB this is bounded by the
per-user event count, not total volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = "event_id",
    gap_seconds: int = 30 * 60,
) -> DataFrame:
    """Assign a per-key ``session_no`` (1-based) that increments whenever
    the gap to the previous event exceeds ``gap_seconds``."""
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    flagged = df.withColumn(
        "__new_session",
        F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.withColumn("session_no", F.sum("__new_session").over(w2)).drop(
        "__new_session"
    )
