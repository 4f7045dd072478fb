"""Sequential single-threaded replay oracle (SURVEY §5.2 #1).

The independent implementation the engine is tested against: a plain Python
dict keyed by (conv_id, turn_idx), applying change events one at a time in
delivery order with max-LSN last-writer-wins. Intentionally naive — no
Spark, no batching — so a bug in the engine cannot be mirrored here.

LWW rule (matches the engine and the reference's strict-greater upsert,
PontusDiscoveryDBClassifierProcessor.java:262): an event applies iff its
lsn is strictly greater than the stored lsn for its key; ties keep the
incumbent (idempotent re-delivery of the same lsn is a no-op). Deletes are
retained as tombstones so a late lower-LSN event still loses; the final
state excludes tombstoned keys.
"""

from __future__ import annotations

from typing import Any, Iterable


def replay(events: Iterable[dict[str, Any]]) -> dict[tuple, dict[str, Any]]:
    """Apply events sequentially; return final live state keyed by
    (conv_id, turn_idx). Each event: dict with lsn, op, conv_id, turn_idx,
    and payload columns (role, text, tool, ts, ...)."""
    state: dict[tuple, dict[str, Any]] = {}
    for ev in events:
        key = (ev["conv_id"], ev["turn_idx"])
        cur = state.get(key)
        if cur is not None and ev["lsn"] <= cur["lsn"]:
            continue
        state[key] = dict(ev)
    return {
        k: {kk: vv for kk, vv in v.items() if kk not in ("op", "epoch_id")}
        for k, v in state.items()
        if v["op"] != "D"
    }


def final_rows(events: Iterable[dict[str, Any]], columns: list[str]) -> list[tuple]:
    """Final state as sorted tuples of ``columns`` (stable (conv_id,
    turn_idx) ordering — the per-row invariant of BASELINE.json)."""
    state = replay(events)
    rows = [tuple(v.get(c) for c in columns) for _, v in sorted(state.items())]
    return rows
