"""Multi-table change-stream routing (runner.MultiTableEngine): per-table
fan-out of one interleaved binlog, idempotent-resume consistency when a
crash lands between two tables' manifest publishes, streaming delivery via
the same foreachBatch path, and envelope source.table routing."""

from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.runner import CdcEngine, MultiTableEngine, stream_apply
from nifi_nlp_processor_spark.sources.envelope import parse_envelope, to_envelope_json

_TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "table string, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, lsn long, op string, epoch_id long"
)
COLS = ["conv_id", "turn_idx", "text"]


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {"table": tb, "conv_id": c, "turn_idx": t, "role": "user",
             "text": x, "tool": None, "ts": _TS, "lsn": l, "op": op,
             "epoch_id": e}
            for tb, c, t, l, x, op, e in rows
        ],
        SCHEMA,
    )


def _mk(spark, tmp_path, tables=("audit", "transcripts")):
    return MultiTableEngine(
        engines={
            t: CdcEngine(lake=ParquetLakeTable(spark, str(tmp_path / t), n_buckets=4))
            for t in tables
        }
    )


def _state(eng, table):
    return sorted(tuple(r) for r in eng.read(table).select(*COLS).collect())


ROWS0 = [
    ("transcripts", "c1", 0, 10, "hello", "I", 0),
    ("transcripts", "c1", 1, 11, "world", "I", 0),
    ("audit", "a1", 0, 12, "login", "I", 0),
]
ROWS1 = [
    ("transcripts", "c1", 1, 20, "world!", "U", 1),
    ("audit", "a1", 0, 21, None, "D", 1),
    ("audit", "a2", 0, 22, "export", "I", 1),
]


def test_routing_and_lww_per_table(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.apply_epochs(_events(spark, ROWS0 + ROWS1), epoch_ids=[0, 1])
    assert _state(eng, "transcripts") == [("c1", 0, "hello"), ("c1", 1, "world!")]
    assert _state(eng, "audit") == [("a2", 0, "export")]


def test_crash_between_publishes_resumes_consistently(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    eng.apply_epoch(_events(spark, ROWS0), 0)

    # simulate a crash AFTER table 'audit' (first in sorted order) commits
    # epoch 1 but BEFORE 'transcripts' does: apply epoch 1 to audit only
    ev1 = _events(spark, ROWS1)
    eng.engines["audit"].apply_epoch(
        ev1.where(F.col("table") == "audit").drop("table"), 1
    )
    assert eng.engines["audit"].lake.committed_epochs() == {0, 1}
    assert eng.engines["transcripts"].lake.committed_epochs() == {0}

    # a FRESH engine over the same roots (the restarted driver) re-applies
    # the whole epoch: audit skips structurally, transcripts completes
    eng2 = _mk(spark, tmp_path)
    res = eng2.apply_epoch(_events(spark, ROWS1), 1)
    assert res["audit"].merge.skipped
    assert not res["transcripts"].merge.skipped
    assert _state(eng2, "transcripts") == [("c1", 0, "hello"), ("c1", 1, "world!")]
    assert _state(eng2, "audit") == [("a2", 0, "export")]


def test_unknown_table_events_are_ignored(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    extra = [("metrics", "m1", 0, 99, "cpu", "I", 0)]
    eng.apply_epoch(_events(spark, ROWS0 + extra), 0)
    assert _state(eng, "transcripts") == [("c1", 0, "hello"), ("c1", 1, "world")]
    assert ("m1", 0, "cpu") not in _state(eng, "audit")


def test_stream_apply_drives_multi_table(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = _events(spark, ROWS0 + ROWS1)
    ev.write.parquet(src)
    eng = _mk(spark, tmp_path)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    # MultiTableEngine satisfies the same apply_epoch(batch, id) contract
    # CdcEngine does, so the foreachBatch delivery path is shared
    q = stream_apply(eng, stream, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)
    assert _state(eng, "transcripts") == [("c1", 0, "hello"), ("c1", 1, "world!")]
    assert _state(eng, "audit") == [("a2", 0, "export")]


def test_envelope_table_routing_round_trip(spark, tmp_path):
    ev = _events(spark, ROWS0 + ROWS1)
    wire = to_envelope_json(ev, table_col="table")
    decoded = parse_envelope(wire, with_table=True)
    assert "table" in decoded.columns
    got = sorted(
        (r.table, r.conv_id, r.turn_idx, r.lsn, r.op) for r in decoded.collect()
    )
    want = sorted(
        (r.table, r.conv_id, r.turn_idx, r.lsn, r.op) for r in ev.collect()
    )
    assert got == want
    # without the flag the engine schema is unchanged (single-table relays)
    assert "table" not in parse_envelope(wire).columns


def test_read_unknown_table_raises(spark, tmp_path):
    eng = _mk(spark, tmp_path)
    with pytest.raises(KeyError):
        eng.read("nope")
