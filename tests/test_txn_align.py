"""Transaction-aligned apply (operators/txn_align.py): split-txn deferral
across micro-batches, torn-transaction invisibility, crash-replay
convergence, and non-transactional passthrough."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.operators.txn_align import TxnAlignedApply
from nifi_nlp_processor_spark.runner import CdcEngine

_TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, lsn long, op string, txn_id long, txn_commit boolean"
)
COLS = ["conv_id", "turn_idx", "text"]


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {"conv_id": c, "turn_idx": t, "role": "user", "text": x,
             "tool": None, "ts": _TS, "lsn": l, "op": "U",
             "txn_id": txn, "txn_commit": cm}
            for c, t, l, x, txn, cm in rows
        ],
        SCHEMA,
    )


def _mk(spark, tmp_path):
    eng = CdcEngine(lake=ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=4))
    return TxnAlignedApply(engine=eng, pending_dir=str(tmp_path / "pending"))


def _state(t):
    return sorted(tuple(r) for r in t.engine.lake.read().select(*COLS).collect())


def test_split_txn_defers_until_commit_record(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # epoch 0: txn 7 is split — its first two events arrive, no commit yet;
    # txn 5 completes in-batch; one autocommit event has no txn at all
    t.apply_epoch(_events(spark, [
        ("c1", 0, 10, "t7-a", 7, False),
        ("c1", 1, 11, "t7-b", 7, False),
        ("c2", 0, 12, "t5-only", 5, True),
        ("c3", 0, 13, "auto", None, None),
    ]), 0)
    # torn txn 7 is INVISIBLE: neither of its rows applied
    assert _state(t) == [("c2", 0, "t5-only"), ("c3", 0, "auto")]
    assert t.open_txn_count() == 1

    # epoch 1: txn 7's commit record arrives -> all three rows apply atomically
    t.apply_epoch(_events(spark, [("c1", 2, 14, "t7-c", 7, True)]), 1)
    assert _state(t) == [
        ("c1", 0, "t7-a"), ("c1", 1, "t7-b"), ("c1", 2, "t7-c"),
        ("c2", 0, "t5-only"), ("c3", 0, "auto"),
    ]
    assert t.open_txn_count() == 0


def test_never_committed_txn_never_applies(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.apply_epoch(_events(spark, [
        ("c1", 0, 10, "orphan", 9, False),
        ("c2", 0, 11, "fine", None, None),
    ]), 0)
    t.apply_epoch(_events(spark, [("c3", 0, 12, "later", None, None)]), 1)
    assert _state(t) == [("c2", 0, "fine"), ("c3", 0, "later")]
    assert t.open_txn_count() == 1  # still pending, carried forward


def test_crash_replay_converges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b0 = _events(spark, [
        ("c1", 0, 10, "t7-a", 7, False),
        ("c2", 0, 11, "solo", None, None),
    ])
    t.apply_epoch(b0, 0)

    # crash AFTER epoch 1's sidecar write but BEFORE the lake commit:
    # simulate by writing the sidecar the way apply_epoch would, without
    # applying
    b1 = _events(spark, [("c1", 1, 12, "t7-b", 7, True)])
    t2 = _mk(spark, tmp_path)
    prev = t2.pending(before_epoch=1)
    events = prev.unionByName(b1)
    events.limit(0).write.mode("overwrite").parquet(
        os.path.join(t2.pending_dir, "p00000001")
    )  # a WRONG partial sidecar from the crashed attempt

    # the restarted driver replays epoch 1 from scratch: it must ignore the
    # crashed attempt's p1 snapshot (>= current epoch), recompute it, and
    # apply txn 7 atomically
    t3 = _mk(spark, tmp_path)
    t3.apply_epoch(b1, 1)
    assert _state(t3) == [("c1", 0, "t7-a"), ("c1", 1, "t7-b"), ("c2", 0, "solo")]

    # replaying epoch 1 AGAIN (at-least-once delivery) is a structural
    # no-op: the ledger skips it and state is unchanged
    t4 = _mk(spark, tmp_path)
    res = t4.apply_epoch(b1, 1)
    assert res.merge.skipped
    assert _state(t4) == _state(t3)


def test_sidecar_gc_keeps_replay_window_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for e in range(4):
        t.apply_epoch(_events(spark, [
            (f"c{e}", 0, 100 + e, f"v{e}", 50 + e, False),  # one open txn per epoch
        ]), e)
    snaps = sorted(os.listdir(t.pending_dir))
    # only the current snapshot and the newest-below-current survive
    assert snaps == ["p00000002", "p00000003"]
    # all four txns are still open and carried in the newest snapshot
    assert t.open_txn_count() == 4
