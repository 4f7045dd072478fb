"""Incremental aggregate maintenance (operators/incremental_rollup.py):
algebraic count/sum retraction from the images="both" changelog must equal
a from-scratch recompute over the target snapshot."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.operators.incremental_rollup import (
    apply_rollup_deltas,
    incremental_rollup,
    rollup_deltas,
)
from nifi_nlp_processor_spark.runner import CdcEngine

_TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, lsn long, op string, epoch_id long"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {"conv_id": c, "turn_idx": t, "role": "user", "text": x,
             "tool": None, "ts": _TS, "lsn": l, "op": o, "epoch_id": e}
            for c, t, l, x, o, e in rows
        ],
        SCHEMA,
    )


AGGS = {"total_chars": lambda img: F.length(img.getField("text"))}


def _recompute(lake, at_seq=None):
    return (
        lake.read(at_seq=at_seq)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )


@pytest.fixture()
def lake(spark, tmp_path):
    """Epoch 0 inserts 3 convs; epoch 1 updates (longer text), deletes one
    whole conv, inserts a new turn, and carries a stale LWW loser."""
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    engine = CdcEngine(lake=lake)
    e0 = [("a", 0, 10, "aaaa", "I", 0), ("a", 1, 11, "bb", "I", 0),
          ("b", 0, 12, "cc", "I", 0), ("c", 0, 13, "dd", "I", 0)]
    e1 = [("a", 0, 100, "much-longer-text", "U", 1),   # update: sum moves
          ("c", 0, 101, None, "D", 1),                  # conv c vanishes
          ("b", 1, 102, "eee", "I", 1),                 # new turn in b
          ("a", 1, 1, "stale", "U", 1)]                 # LWW loser: no-op
    engine.apply_epochs(_events(spark, e0 + e1), epoch_ids=[0, 1])
    return lake


def test_incremental_equals_recompute(spark, lake):
    prev = _recompute(lake, at_seq=1)
    got = incremental_rollup(lake, 1, ["conv_id"], AGGS, prev=prev)
    want = _recompute(lake)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_fully_deleted_group_disappears(spark, lake):
    prev = _recompute(lake, at_seq=1)
    got = incremental_rollup(lake, 1, ["conv_id"], AGGS, prev=prev)
    assert "c" not in {r.conv_id for r in got.collect()}


def test_bootstrap_from_empty(spark, lake):
    # from_seq=0 with no prev: deltas alone rebuild the full rollup
    got = incremental_rollup(lake, 0, ["conv_id"], AGGS, prev=None)
    want = _recompute(lake)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_update_retracts_old_contribution(spark, lake):
    ch = lake.table_changes(1, images="both")
    d = {r.conv_id: r for r in rollup_deltas(ch, ["conv_id"], AGGS).collect()}
    # a0: 'aaaa'(4) -> 'much-longer-text'(16): +12 chars, net 0 rows
    assert d["a"].n_rows == 0 and d["a"].total_chars == 12
    # c0 deleted: -1 row, -2 chars
    assert d["c"].n_rows == -1 and d["c"].total_chars == -2
    # b1 inserted: +1 row, +3 chars
    assert d["b"].n_rows == 1 and d["b"].total_chars == 3


def test_mutable_group_col_rejected(spark, lake):
    with pytest.raises(ValueError, match="not lake merge keys"):
        incremental_rollup(lake, 1, ["role"], AGGS)


def test_schema_mismatch_rejected(spark, lake):
    prev = _recompute(lake, at_seq=1).withColumnRenamed("total_chars", "other")
    deltas = rollup_deltas(lake.table_changes(1, images="both"), ["conv_id"], AGGS)
    with pytest.raises(ValueError, match="rollup schemas differ"):
        apply_rollup_deltas(prev, deltas, ["conv_id"])


def test_images_both_contract(spark, lake):
    rows = {
        (r.conv_id, r.turn_idx): r
        for r in lake.table_changes(1, images="both").collect()
    }
    ins = rows[("b", 1)]
    assert ins.change_type == "insert" and ins.pre is None and ins.post.text == "eee"
    dele = rows[("c", 0)]
    assert dele.change_type == "delete" and dele.post is None and dele.pre.text == "dd"
    upd = rows[("a", 0)]
    assert upd.pre.text == "aaaa" and upd.post.text == "much-longer-text"


def test_null_to_value_update_contributes_delta(spark, tmp_path):
    """An update that fills a previously-NULL column must contribute its
    full delta — the NULL side coalesces to 0 instead of poisoning the
    plus-minus into NULL (which sum() would then silently skip)."""
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=2)
    engine = CdcEngine(lake=lake)
    rows = [
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "t",
         "tool": None, "ts": _TS, "lsn": 1, "op": "I", "epoch_id": 0},
        {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "t",
         "tool": "grep", "ts": _TS, "lsn": 2, "op": "U", "epoch_id": 1},
    ]
    engine.apply_epochs(spark.createDataFrame(rows, SCHEMA), epoch_ids=[0, 1])
    aggs = {"tool_chars": lambda img: F.length(img.getField("tool"))}
    prev = (
        lake.read(at_seq=1)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(F.length("tool")), F.lit(0)).alias("tool_chars"),
        )
    )
    got = incremental_rollup(lake, 1, ["conv_id"], aggs, prev=prev).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_rows == 1 and r.tool_chars == 4  # len('grep'), not NULL-skipped
