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
