"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream semantics the built-in windows can't express
(the built-ins cover the reference-parity scope; this is the additive
"custom stateful operator" surface, SURVEY.md §7.2 step 6).

Example operator: per-user running profile (event count, value total,
last-seen timestamp) emitted on every update, with idle-timeout state
eviction — the streaming analogue of the gold ``fact_client_summary``
row, maintained incrementally instead of recomputed per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n_events long, total_value double, last_seen timestamp"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State update function: fold each micro-batch's events for one user
    into (n_events, total_value, last_seen); emit the refreshed row."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, round(total, 2), last))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    except Exception:
        pass  # timeout not configured (evict_idle=False)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_seen": [last],
        }
    )


def running_user_profile(
    events: DataFrame, evict_idle: bool = False
) -> DataFrame:
    """Incrementally-maintained per-user profile over an event stream.
    State is partitioned by user_id (Spark's state store shards it with
    the shuffle) and Arrow-batched per group.

    ``evict_idle=True`` enables processing-time timeout eviction for
    unbounded key spaces (the 100-TB concern: state must not grow
    forever). Off by default: with a timeout configured Spark schedules
    extra empty micro-batches to fire expirations, which a finite
    replay-to-verify harness doesn't want."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
