"""Custom stateful streaming operators (applyInPandasWithState).

The escape hatch for streaming semantics the built-in operators can't
express (north-star brief: "applyInPandasWithState for custom stateful
operators"). The state is per-group, Arrow-batched, checkpointed with
the query — the operator shards by group key exactly like a groupBy, so
it scales horizontally with no driver involvement.

``running_user_stats`` is the canonical shape: per-user lifetime
counters maintained across micro-batches (count, value sum, last-seen
timestamp) with an idle-timeout that finalizes and evicts state — the
pattern real per-entity enrichment (fraud counters, rate limits,
session carts) follows. Built-in aggregations could compute the counts;
the point is the *stateful kernel contract*: initialize / update /
timeout, with bounded per-key state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch", T.LongType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)


IDLE_TIMEOUT_MS = 60 * 60 * 1000  # 1h idle eviction when timeouts enabled


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    """Stateful kernel: fold each micro-batch's rows for one user into
    the persisted (count, sum, last_seen) tuple; on idle timeout emit a
    final row and evict."""
    (user_id,) = key
    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, n, total, last, True]], columns=[f.name for f in OUTPUT_SCHEMA]
        )
        return

    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000))
    state.update((n, round(total, 2), last))
    try:
        state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    except Exception:
        pass  # NoTimeout mode: eviction disabled (bounded runs)
    yield pd.DataFrame(
        [[user_id, n, round(total, 2), last, False]],
        columns=[f.name for f in OUTPUT_SCHEMA],
    )


def running_user_stats(events: DataFrame, idle_timeout: bool = True) -> DataFrame:
    """Per-user lifetime counters as a custom stateful streaming operator.

    ``idle_timeout=False`` disables state eviction — required for bounded
    ``availableNow`` runs, where pending processing-time timeouts keep
    the query alive past the data (observed: a finished ingest hanging
    for minutes waiting to fire evictions). Long-lived production streams
    keep it on.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 successor: transformWithStateInPandas (StatefulProcessor API).
# Same per-user counters, but with typed composable state handles
# (ValueState/ListState/MapState per key), native timers instead of the
# single timeoutConf, and initial-state bootstrap — the API Spark
# evolves; applyInPandasWithState above stays as the stable fallback.
# ---------------------------------------------------------------------------


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` on the transformWithStateInPandas API.

    State is a named ValueState handle (checkpointed per key, sharded by
    the groupBy exactly like the legacy operator); emission contract is
    identical (one update row per user per micro-batch, ``finalized``
    False — eviction would use ``handle.registerTimer`` in a long-lived
    stream). Defined lazily: the processor class is created inside so
    importing this module never requires the new API.

    RUNTIME REQUIREMENTS (verified in this container, 2026-08-13): the
    query must run with the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) AND the Python environment
    must have ``google.protobuf`` — the TWS driver worker speaks a
    protobuf state-server protocol and crashes at init without it
    ("cannot import name 'descriptor' from 'google.protobuf'",
    StateMessage_pb2.py:23). protobuf is absent here and cannot be
    installed (no network), so the operator is exercised only where the
    dependency exists (tests skip via importorskip); the
    applyInPandasWithState twin above is the dependency-free fallback
    with identical semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._stats.exists():
                n, total, last = self._stats.get()
            else:
                n, total, last = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000))
            self._stats.update((n, round(total, 2), last))
            yield pd.DataFrame(
                [[user_id, n, round(total, 2), last, False]],
                columns=[f.name for f in OUTPUT_SCHEMA],
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
