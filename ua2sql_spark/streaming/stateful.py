"""Custom stateful streaming operator (SURVEY §2.9 T10):
``applyInPandasWithState`` running per-user session accumulation.

The reference has no stateful processing at all — its only state is the
JobId offset row. This is the engine's extension point for operators
Spark's built-ins can't express: arbitrary per-key state with timeout
handling, Arrow-batched.

State is deliberately tiny (a few scalars per user) and keyed by
user id — the high-cardinality-safe shape for 100 TB streams
(SURVEY §7 hard part 5).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals across micro-batches. Emits the updated
    running aggregate once per batch in which the user appears."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful accumulator to a streaming events frame with
    columns (user_id, value). Output mode: update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 successor API: transformWithStateInPandas. Same running-totals
# semantics as ``running_user_totals`` plus a deterministic max tracker,
# expressed as a StatefulProcessor with a typed ValueState handle. The
# new API is the forward path: typed state (Value/List/Map), per-key
# timers, state TTL, and a mandatory RocksDB state store — the store
# that actually holds 100 TB-stream state (incremental checkpoints,
# changelog uploads), vs the HDFS-backed in-memory map the old API
# defaults to.
# ---------------------------------------------------------------------------
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

TWS_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_value DOUBLE"
)
TWS_STATE_SCHEMA = "n BIGINT, total DOUBLE, mx DOUBLE"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum, max) across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", TWS_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, total, mx = self._agg.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._agg.update((n, total, mx))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas running totals; requires the session
    to run the RocksDB state store provider (see ROCKSDB_PROVIDER)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
