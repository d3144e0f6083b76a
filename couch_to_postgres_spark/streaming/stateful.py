"""Custom stateful streaming operator: gap sessionization via
``applyInPandasWithState`` (Arrow-batched per-key state machine).

This is the pattern for operators Structured Streaming's built-ins can't
express (the built-in ``session_window`` covers plain gap windows; this
skeleton is where richer per-key logic — cart abandonment, rev-chain
validation, rate anomaly detection — plugs in).

State is one row per key ``(session_no, start_ts, last_ts, n)`` in epoch-µs; each
micro-batch folds its rows into the state and emits a rollup row for every
session it touched (output mode ``update`` — downstream keeps the last row
per (key, session_no), which tests assert equals the batch oracle
``windows.sessionize_batch``).

Scale: state lives in the state store partitioned by key — per-key memory
is O(1), per-batch work is O(batch); exactly the shape that survives an
unbounded 100 TB/day feed. Assumes per-key event-time order across
micro-batches (true for seq-ordered change logs; out-of-order feeds need a
watermark + buffer stage first).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType()),
        StructField("start_ts", LongType()),
        StructField("last_ts", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fold(gap_us: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            session_no, start_ts, last_ts, n = state.get
        else:
            session_no, start_ts, last_ts, n = 0, None, None, 0
        touched: dict[int, tuple[int, int, int]] = {}
        # one group arrives as MULTIPLE Arrow chunks — gather before
        # sorting, or cross-chunk order corrupts the session walk
        all_ts: list[int] = []
        for pdf in pdfs:
            all_ts.extend(int(t) for t in pdf["_ts_us"].tolist())
        for ts in sorted(all_ts):
            if last_ts is None or ts - last_ts > gap_us:
                session_no += 1
                start_ts, n = ts, 0
            last_ts = ts
            n += 1
            touched[session_no] = (start_ts, last_ts, n)
        state.update((session_no, start_ts, last_ts, n))
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(touched),
                    "session_no": list(touched),
                    "n_events": [v[2] for v in touched.values()],
                    "session_start_us": [v[0] for v in touched.values()],
                    "session_end_us": [v[1] for v in touched.values()],
                }
            )

    return fold


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
) -> DataFrame:
    """Stateful streaming sessionization; input must carry a
    timestamp-like ``ts`` (native timestamp or ns long — normalized to µs
    here) and ``key_col``. Emits updated session rollups each micro-batch.
    State is kept in epoch-µs so it matches the batch oracle exactly."""
    from couch_to_postgres_spark.session import ts_micros

    events = events.withColumn("_ts_us", ts_micros(events, "ts"))
    gap_us = gap_minutes * 60 * 1_000_000
    return events.groupBy(key_col).applyInPandasWithState(
        _session_fold(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
