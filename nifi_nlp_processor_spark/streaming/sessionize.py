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
until a later event closes it, or — with ``emit_on_timeout=True`` — until
the event-time watermark passes (last event + gap), which closes it BY
TIME and evicts the state (the production shape; the default stays
timeout-free so oracle comparisons are watermark-independent).

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


def _closed_df(user_id, closed: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": [int(c[2]) for c in closed],
        }
    )


def _make_fn(gap_seconds: int, emit_on_timeout: bool = False):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if emit_on_timeout and state.hasTimedOut:
            # the watermark passed this user's last event + gap with no
            # successor: the open session is closed by TIME, not by a next
            # event — emit it and clear the state
            s = tuple(state.get)
            state.remove()
            yield _closed_df(user_id, [s])
            return
        # Materialize ALL chunks before sorting: chunk boundaries are an
        # Arrow batching artifact with no time-order guarantee.
        chunks = [pdf["ts"] for pdf in pdfs if len(pdf)]
        carried = tuple(state.get) if state.exists else None
        if not chunks:
            return  # empty delivery: state untouched
        us = pd.concat(chunks, ignore_index=True).astype("int64") // 1_000
        sessions = _sessionize_batch(us, gap_us, carried)
        open_s = tuple(int(x) for x in sessions[-1])
        state.update(open_s)
        if emit_on_timeout:
            # event-time timeout fires when the watermark passes this
            # (ms precision — Spark's event-time clock)
            state.setTimeoutTimestamp(open_s[1] // 1_000 + gap_seconds * 1_000)
        closed = sessions[:-1]
        if closed:
            yield _closed_df(user_id, closed)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    emit_on_timeout: bool = False,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming sessionization: ``events`` must carry ``user_id`` and
    ``ts``; returns the append-mode stream of CLOSED sessions.

    ``emit_on_timeout=False`` (default): a session closes only when a
    later event of the same user arrives past the gap — deterministic for
    oracle testing, but a user who stops sending never gets their final
    session emitted.

    ``emit_on_timeout=True``: the production shape. A watermark
    (``watermark_delay``, default = the gap itself) drives an EVENT-TIME
    timeout set to (last event + gap): when the watermark passes it with
    no successor, the open session is emitted as closed by time. Late
    events within the delay still extend their session; the at-rest state
    is evicted, so abandoned users cost nothing."""
    if emit_on_timeout:
        events = events.withWatermark(
            "ts", watermark_delay or f"{gap_seconds} seconds"
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_seconds, emit_on_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
