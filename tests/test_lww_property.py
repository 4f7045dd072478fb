"""Property-based replay equivalence (hypothesis).

The generator-based cases in test_replay.py cover realistic stream shapes;
this test hands the engine ARBITRARY small event multisets — random key
collisions, LSN storms on one key, deletes anywhere, duplicate delivery,
any epoch split — and demands exact equality with the sequential oracle.

Contract note: events are generated with content a pure function of
(conv_id, turn_idx, lsn), matching real CDC streams where an LSN uniquely
identifies a change. Outside that contract (same key+lsn with DIFFERENT
payloads) the engine and oracle legitimately diverge by design: the oracle
keeps the first-delivered row (delivery order), while the engine breaks
ties by content hash (lake.py merge order struct) — delivery order does
not exist in a distributed shuffle, and the hash rule is what makes
replays and cluster-size changes byte-stable.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.oracle import final_rows
from nifi_nlp_processor_spark.runner import CdcEngine

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
_TS = datetime.datetime(2026, 1, 1, 0, 0, 0)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, lsn long, op string, epoch_id long"
)

triples = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 3), st.integers(1, 25)),
    min_size=1,
    max_size=40,
)


def _event(conv: int, turn: int, lsn: int) -> dict:
    # op and payload are pure functions of (key, lsn) — the CDC contract
    return {
        "conv_id": f"c{conv}",
        "turn_idx": turn,
        "role": "user" if lsn % 2 else "assistant",
        "text": f"t-{conv}-{turn}-{lsn}",
        "tool": None if lsn % 3 else "search",
        "ts": _TS + datetime.timedelta(seconds=lsn),
        "lsn": lsn,
        "op": "D" if (conv + turn + lsn) % 7 == 0 else "U",
        "epoch_id": lsn % 2,
    }


_counter = [0]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=triples)
def test_lww_merge_equals_oracle(spark, tmp_path_factory, raw):
    events = [_event(c, t, l) for c, t, l in raw]
    df = spark.createDataFrame(events, SCHEMA)

    _counter[0] += 1
    root = tmp_path_factory.mktemp(f"prop{_counter[0]}")
    lake = ParquetLakeTable(spark, str(root / "lake"), n_buckets=4)
    CdcEngine(lake=lake).apply_epochs(df, epoch_ids=[0, 1])

    got = sorted(tuple(r) for r in lake.read().select(*COLS).collect())
    want = sorted(final_rows(events, COLS))
    assert got == want
