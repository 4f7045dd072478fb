"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming layer at all (NiFi gives per-record
at-least-once with no event-time notion — SURVEY §2.10); the batch
``sessionize_events`` query covers the analytical form with a lag window.
This module supplies the STREAMING form the north rule's architecture
implies: per-user session state kept across micro-batches with
``applyInPandasWithState`` — Arrow-batched per group, state is a single
small tuple per user, no per-row Python in the planner's sense (the
pandas function sees whole group batches).

Semantics (identical to the batch lag-window form): events of one user
belong to one session while consecutive gaps are ≤ ``gap_seconds``; a
larger gap closes the running session and starts a new one. Closed
sessions are EMITTED (append mode); the running session stays in state
until a later batch closes it (or a GroupStateTimeout would flush it —
timeout flushing is left to the caller's trigger policy so results stay
deterministic for testing).

Scale: state per key is O(1) (three scalars), group batches arrive sorted
per key only within what the caller guarantees — the function sorts each
batch by timestamp, and cross-batch ordering is the stream's
watermark/delivery contract, as with any Spark stateful operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.IntegerType()),
    ]
)


def _make_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed: list[tuple] = []
        for pdf in pdfs:
            ts = pdf["ts"].sort_values()
            for t in ts:
                t_us = t.value // 1_000  # pandas ns → µs
                if last_us is not None and t_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, n = t_us, 0
                if start_us is None:
                    start_us = t_us
                last_us = t_us
                n += 1
        state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization: ``events`` must carry ``user_id`` and
    ``ts``; returns the append-mode stream of CLOSED sessions."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
