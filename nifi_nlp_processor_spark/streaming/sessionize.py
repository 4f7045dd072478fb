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

Scale: state per key is O(1) (three scalars). A group's rows arrive as an
ITERATOR of Arrow chunks in arbitrary (post-shuffle) order — a user whose
micro-batch exceeds ``spark.sql.execution.arrow.maxRecordsPerBatch`` spans
several chunks — so the function materializes the full group and sorts by
timestamp ONCE before sessionizing (sorting per chunk would split sessions
wrongly and could even emit session_end < session_start). Cross-BATCH
ordering is the stream's watermark/delivery contract, as with any Spark
stateful operator. Within a batch the session boundaries are computed
vectorized (diff + cumsum over the sorted series, one groupby aggregate),
not an event-at-a-time Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


def _sessionize_batch(
    us,
    gap_us: int,
    carried: tuple | None,
) -> list[tuple]:
    """Pure, vectorized core (unit-testable without Spark): ``us`` is the
    group's full micro-batch of event times in µs (pd.Series or ndarray),
    UNSORTED; ``carried`` is the open (start_us, last_us, n) session from
    state or None. Returns the batch's sessions in time order as
    (start_us, last_us, n) int tuples, carried session merged — the LAST
    tuple is the still-open session, everything before it closed.

    One numpy sort + one diff + fancy indexing on the session boundaries —
    no per-event Python, no intermediate DataFrame (block consolidation on
    a large batch costs more than the whole computation)."""
    arr = np.sort(np.asarray(us, dtype=np.int64))
    brk = np.empty(arr.shape, dtype=bool)
    np.greater(arr[1:] - arr[:-1], gap_us, out=brk[1:])
    # does the first event continue the carried session or open a new one?
    brk[0] = True if carried is None else int(arr[0]) - carried[1] > gap_us
    bounds = np.flatnonzero(brk)  # index of each session's first event
    continues = False
    if bounds.size == 0 or bounds[0] != 0:
        bounds = np.insert(bounds, 0, 0)  # segment 0 continues `carried`
        continues = True
    ends = np.append(bounds[1:], arr.size)
    sessions = [
        (int(arr[s]), int(arr[e - 1]), int(e - s))
        for s, e in zip(bounds, ends)
    ]
    if carried is not None:
        if continues:
            s0 = sessions[0]
            sessions[0] = (carried[0], s0[1], carried[2] + s0[2])
        else:
            # batch starts past the gap: the carried session closes as-is
            sessions.insert(0, tuple(carried))
    return sessions


def _make_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # Materialize ALL chunks before sorting: chunk boundaries are an
        # Arrow batching artifact with no time-order guarantee.
        chunks = [pdf["ts"] for pdf in pdfs if len(pdf)]
        carried = tuple(state.get) if state.exists else None
        if not chunks:
            return  # timeout/empty delivery: state untouched
        us = pd.concat(chunks, ignore_index=True).astype("int64") // 1_000
        sessions = _sessionize_batch(us, gap_us, carried)
        state.update(tuple(int(x) for x in sessions[-1]))
        closed = sessions[:-1]
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [int(c[2]) for c in closed],
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
