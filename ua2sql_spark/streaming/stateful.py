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
