"""Custom stateful streaming operator via applyInPandasWithState.

The engine's example of a stateful operator Spark doesn't ship: a
per-entity running alert counter with first/last-seen tracking (the
'how many times has this drive alerted so far' signal the reference's
daily batch recomputes from scratch every day).

State design for scale: state is ONE tiny row per entity (3 numbers),
partitioned by the group key across executors by the shuffle that
``groupBy`` already requires; each micro-batch touches only the
groups present in that batch, Arrow-batched. Use a timeout
(``GroupStateTimeout``) in production to expire idle entities and
bound the state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_alerts", T.LongType()),
        T.StructField("first_alert_ts", T.TimestampType()),
        T.StructField("last_alert_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_alerts", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def running_alert_counts(
    scored: DataFrame, threshold: float
) -> DataFrame:
    """Streaming per-user cumulative alert counts (update mode)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, first_us, last_us = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in pdfs:
            hits = pdf[pdf["failure_probability"] >= threshold]
            if len(hits):
                ts_us = hits["ts"].astype("int64") // 1000
                n += len(hits)
                lo, hi = int(ts_us.min()), int(ts_us.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
        if n:
            state.update((n, first_us, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_alerts": [n],
                    "first_alert_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_alert_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

    return scored.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_event_counts_tws(stream: DataFrame) -> DataFrame:
    """Per-user running event counts via ``transformWithStateInPandas``
    — Spark 4's arbitrary-stateful successor to applyInPandasWithState:
    named state variables (ValueState here; ListState/MapState/timers
    in the full API) managed by the state-store, declared in
    ``init()`` rather than threaded through one opaque tuple.

    Requires the RocksDB state-store provider and a working
    ``google.protobuf`` (the stateful-processor worker speaks proto to
    the JVM state server); the test gates on that import. At scale the
    contract matches applyInPandasWithState: state shards with the
    group-by shuffle, one tiny row per key, RocksDB keeps hot state
    off-heap with changelog checkpointing.
    """
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    class _RunningCount(StatefulProcessor):
        def init(self, handle) -> None:
            self._count = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timer_values):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            self._count.update((prev + n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [prev + n]})

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        _RunningCount(),
        outputStructType="user_id BIGINT, n_events BIGINT",
        outputMode="Update",
        timeMode="None",
    )


def session_finalize_with_timeout(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Custom sessionization with EVENT-TIME TIMEOUT eviction: state
    per user accumulates (n, last_ts); when the watermark passes
    last_ts + gap with no new events, the timeout FIRES for that key
    (``state.hasTimedOut``) and the finalized session row is emitted
    exactly once, with the state removed. This is the pattern for
    operators whose OUTPUT happens on silence (session close, absence
    alerts, SLA breaches) — something windowed aggregation can't
    express directly. The engine's native-session twin is
    pipeline.session_count_stream; this one owns its emission policy.

    Scale: state per ACTIVE user only — the timeout is what keeps the
    store from accumulating every user ever seen."""

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
        ]
    )
    st_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("last_us", T.LongType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "session_end_us": [last_us],
                }
            )
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                ts_us = pdf["ts"].astype("int64") // 1000
                n += len(pdf)
                last_us = max(last_us, int(ts_us.max()))
        if n:
            state.update((n, last_us))
            # fire once the event-time watermark passes the gap
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        return

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=st_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
