"""T5: streaming odds-movement alerts.

The reference polls every 15 minutes with a LAG-over-last-hour SQL
query (/root/reference/discord_integration.py:469-498). Structured
Streaming has no LAG, so the operator is stateful: per series key
(user_id, event_type ≈ fixture, market+bookmaker) the state is the
last seen (ts, value); each micro-batch emits one alert row per
consecutive pair moving more than the threshold.

``applyInPandasWithState`` keeps state in the state store (fault
tolerant, scales with key cardinality, not history length). A
processing-time timeout ages out dead series — the state-TTL
analogue of the reference's retention rules.

The batch-first equivalent (q_lag_movement) remains the correctness
surface; a pytest drives this streaming version over the same events
parquet through a memory sink and cross-checks the two.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = (
    "user_id long, event_type string, ts timestamp, value double, "
    "prev_value double, pct_change double"
)
STATE_SCHEMA = "last_ts timestamp, last_value double"
DEFAULT_THRESHOLD = 0.10  # discord_integration.py:493-494


def _movement_fn(threshold: float):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=["user_id", "event_type", "ts", "value", "prev_value", "pct_change"]
            )
            return
        user_id, event_type = key
        prev_ts, prev_val = state.get if state.exists else (None, None)
        out: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                if prev_val is not None and prev_val != 0:
                    pct = (row.value - prev_val) / prev_val * 100.0
                    if abs(pct) > threshold * 100.0:
                        out.append((user_id, event_type, row.ts, row.value, prev_val, pct))
                prev_ts, prev_val = row.ts, row.value
        if prev_ts is not None:
            state.update((prev_ts, prev_val))
            state.setTimeoutDuration(24 * 3600 * 1000)  # 1-day state TTL
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "ts", "value", "prev_value", "pct_change"]
        )

    return fn


def movement_alerts(events: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Wire the stateful kernel onto a (possibly streaming) events
    DataFrame with columns (event_id, ts, user_id, event_type, value).
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _movement_fn(threshold),
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
