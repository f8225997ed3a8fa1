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
    """Per-user running (count, sum, max) across micro-batches.

    ``ttl_ms`` bounds per-key state lifetime (VERDICT r6/r7 streaming
    gap): with millions of one-visit users, unbounded keyed state is
    the thing that actually kills a 100 TB stream — RocksDB evicts any
    key whose state was not refreshed within the TTL, so total state is
    bounded by the ACTIVE key set. An evicted key that reappears simply
    restarts from zero (the documented semantics of a recency-bounded
    profile). Requires timeMode="ProcessingTime" (TTL clocks are
    processing-time by API contract)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", TWS_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

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


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """transformWithStateInPandas running totals; requires the session
    to run the RocksDB state store provider (see ROCKSDB_PROVIDER).
    ``ttl_ms`` turns on state TTL (and with it the ProcessingTime time
    mode) so idle keys age out of the store."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms=ttl_ms),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )


# ---------------------------------------------------------------------------
# T10 extension: TIMER-driven session timeout — the stateful pattern
# watermark-windowed aggregation cannot express: emit a per-user
# session summary exactly when the user goes quiet for GAP, not when a
# fixed window closes. Event-time timers make it deterministic: the
# processor re-registers a timer at (last_seen + GAP) on every input,
# and when the WATERMARK passes that mark Spark calls
# handleExpiredTimer — so expiry is driven by data progress, never by
# wall-clock (replayable, testable, skew-tolerant). Stale timers (the
# user came back before the old timer fired) are detected by
# re-checking the expiry condition against current state; the live
# timer set is pruned with deleteTimer. State clears on emission, so
# per-key state is O(1) and the RocksDB store bounds total state by
# ACTIVE sessions only.
# ---------------------------------------------------------------------------
SESSION_GAP_MS = 30_000

SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, first_ms BIGINT, last_ms BIGINT"
)
_SESSION_STATE_SCHEMA = "n BIGINT, first_ms BIGINT, last_ms BIGINT"


class SessionTimeoutProcessor(StatefulProcessor):
    """Close a user session GAP ms after their last event (event time)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState("sess", _SESSION_STATE_SCHEMA)
        self._handle = handle

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        """Fold the batch's event times into gap-separated sessions.

        Sessions that CLOSE inside the batch (a following event more
        than GAP later) are emitted immediately; only the trailing open
        session stays in state with a timer at last+GAP. Splitting
        within the batch makes the output invariant to micro-batch
        slicing: a backfill replaying a whole day in one AvailableNow
        batch emits the same session rows as the original run that saw
        the events across many batches (late data beyond the watermark
        excepted, as for any event-time operator)."""
        ms: list[int] = []
        for pdf in rows:
            if len(pdf):
                ms.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
        if not ms:
            return iter(())
        ms.sort()
        n, first_ms, last_ms = (
            self._sess.get() if self._sess.exists() else (0, None, None)
        )
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        for t in ms:
            if last_ms is not None and t - last_ms > SESSION_GAP_MS:
                closed.append((n, first_ms, last_ms))
                n, first_ms, last_ms = 0, t, None
            if first_ms is None:
                first_ms = t
            n += 1
            # A cross-batch out-of-order event can arrive with t older
            # than the stored last_ms (the in-batch sort can't order
            # across batches). Folding it in must never REGRESS the
            # session bounds: max keeps the timer armed at the true
            # quiet point, min admits a late-but-in-session event into
            # first_ms. (Plain `last_ms = t` would re-arm the timer
            # earlier than the real last event and emit a wrong session
            # end for any caller with a nonzero watermark delay.)
            first_ms = min(first_ms, t)
            last_ms = t if last_ms is None else max(last_ms, t)
        self._sess.update((n, first_ms, last_ms))
        # one live timer per key: drop superseded marks, arm the new one
        for t in self._handle.listTimers():
            if t != last_ms + SESSION_GAP_MS:
                self._handle.deleteTimer(t)
        self._handle.registerTimer(last_ms + SESSION_GAP_MS)
        if not closed:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "n_events": [c[0] for c in closed],
                        "first_ms": [c[1] for c in closed],
                        "last_ms": [c[2] for c in closed],
                    }
                )
            ]
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return iter(())
        n, first_ms, last_ms = self._sess.get()
        if expiredTimerInfo.getExpiryTimeInMs() < last_ms + SESSION_GAP_MS:
            return iter(())  # stale: the user came back, a newer timer exists
        self._sess.clear()
        (user_id,) = key
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "first_ms": [first_ms],
                        "last_ms": [last_ms],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


def session_timeout_tws(events: DataFrame) -> DataFrame:
    """Timer-closed sessions over a watermarked event stream; requires
    the RocksDB state store provider (ROCKSDB_PROVIDER)."""
    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTimeoutProcessor(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Typed-state completion: ListState + MapState in one processor — the
# per-user event-type profile a feature store maintains online:
# MapState holds per-event-type counts (point lookups + upserts, no
# full-map rewrite — RocksDB stores each map entry as its own KV, so a
# 1M-type map costs one entry touch per event), ListState holds the
# last-N event values (appendList + truncate-on-read; bounded recency
# buffer), and a small ValueState carries the DERIVED aggregates
# (n_types, running top) so emitting a profile never iterates the full
# map — per-batch cost is O(|batch|) state touches, independent of how
# many distinct types the user has ever produced.
# ---------------------------------------------------------------------------
PROFILE_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_types BIGINT, top_type STRING, top_type_n BIGINT, "
    "recent_n BIGINT, recent_sum DOUBLE"
)
_PROFILE_RECENT_KEEP = 3
_PROFILE_NULL_TYPE = "__null__"  # nullable feeds must not kill the query


class UserProfileProcessor(StatefulProcessor):
    """Per-user online profile: event-type counts (MapState) + last-N
    values (ListState) + incrementally maintained top-type
    (ValueState)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        # one TTL across all three states: a half-evicted profile (map
        # gone, top surviving) would report phantom aggregates
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "t STRING", "n BIGINT", ttlDurationMs=self._ttl_ms
        )
        self._recent = handle.getListState(
            "recent", "v DOUBLE", ttlDurationMs=self._ttl_ms
        )
        self._top = handle.getValueState(
            "top",
            "n_types BIGINT, top_type STRING, top_n BIGINT",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n_types, top_type, top_n = (
            self._top.get() if self._top.exists() else (0, None, 0)
        )
        appended = []
        for pdf in rows:
            types = pdf["event_type"].fillna(_PROFILE_NULL_TYPE)
            for t, n in types.groupby(types).size().items():
                if self._counts.containsKey((t,)):
                    cur = self._counts.getValue((t,))[0]
                else:
                    cur, n_types = 0, n_types + 1
                cur += int(n)
                self._counts.updateValue((t,), (cur,))
                # deterministic running top: higher count wins, ties by
                # lexicographically smaller type
                if cur > top_n or (cur == top_n and (top_type is None or t < top_type)):
                    top_type, top_n = t, cur
            appended.extend((float(v),) for v in pdf["value"].dropna())
        if appended:
            self._recent.appendList(appended)
        self._top.update((n_types, top_type, top_n))
        # truncate the recency buffer to the last N (list is append-ordered)
        vals = [v[0] for v in self._recent.get()]
        if len(vals) > _PROFILE_RECENT_KEEP:
            vals = vals[-_PROFILE_RECENT_KEEP:]
            self._recent.put([(v,) for v in vals])
        if n_types == 0:
            return iter(())  # nothing countable yet for this user
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_types": [n_types],
                "top_type": [top_type],
                "top_type_n": [top_n],
                "recent_n": [len(vals)],
                "recent_sum": [float(sum(vals))],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Map+List typed-state profile; requires the RocksDB provider.
    ``ttl_ms`` ages idle users out of the store (see
    RunningTotalsProcessor)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(ttl_ms=ttl_ms),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )
