"""Changelog read (Iceberg CDF / table_changes analogue): net row-level
delta between two committed snapshots, classified insert/update/delete,
with pre-images for deletes, manifest-diff bucket pruning, bootstrap reads
(from_seq=0), and schema evolution across the span."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.lake import ParquetLakeTable
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


@pytest.fixture()
def lake2(spark, tmp_path):
    """Epoch 0: 6 inserts. Epoch 1: update c0/0, delete c1/0, insert c9/0,
    and a stale lower-LSN event for c2/0 that must lose LWW (no change)."""
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    engine = CdcEngine(lake=lake)
    e0 = [(f"c{i}", 0, 10 + i, f"v0-{i}", "I", 0) for i in range(6)]
    e1 = [
        ("c0", 0, 100, "v1-upd", "U", 1),
        ("c1", 0, 101, None, "D", 1),
        ("c9", 0, 102, "v1-new", "I", 1),
        ("c2", 0, 1, "stale-loser", "U", 1),
    ]
    engine.apply_epochs(_events(spark, e0 + e1), epoch_ids=[0, 1])
    return lake


def test_classification_and_images(spark, lake2):
    got = {
        (r.conv_id, r.turn_idx, r.change_type, r.lsn, r.text)
        for r in lake2.table_changes(from_seq=1).collect()
    }
    assert got == {
        ("c0", 0, "update", 100, "v1-upd"),
        # delete carries the PRE-image text and the tombstone's LSN
        ("c1", 0, "delete", 101, "v0-1"),
        ("c9", 0, "insert", 102, "v1-new"),
        # c2's stale event lost LWW -> no change row; c3..c5 untouched
    }


def test_bootstrap_from_zero_is_all_live_rows(spark, lake2):
    ch = lake2.table_changes(from_seq=0)
    assert ch.where(F.col("change_type") != "insert").count() == 0
    live = {tuple(r) for r in lake2.read().select("conv_id", "turn_idx").collect()}
    got = {tuple(r) for r in ch.select("conv_id", "turn_idx").collect()}
    assert got == live


def test_noop_span_is_empty(spark, lake2):
    assert lake2.table_changes(from_seq=2, to_seq=2).count() == 0


def test_manifest_diff_prunes_untouched_buckets(spark, lake2):
    """Only buckets whose pointer changed between the snapshots may be
    read: the delta between seq 1 and seq 2 comes from epoch 1's 4 keys,
    so the pointer diff must be a strict subset of the table's buckets,
    and the scanned files must all live under the touched buckets."""
    c1, c2 = lake2.commit_at(1), lake2.commit_at(2)
    changed = {
        b
        for b in set(c1["buckets"]) | set(c2["buckets"])
        if c1["buckets"].get(b) != c2["buckets"].get(b)
    }
    assert changed and changed < set(c2["buckets"])
    # the physical scan of the changelog read only references changed dirs
    plan = lake2.table_changes(from_seq=1)._jdf.queryExecution().executedPlan().toString()
    for b, ptr in c2["buckets"].items():
        if b not in changed:
            assert ptr["path"] not in plan


def test_schema_evolution_across_span(spark, tmp_path):
    """Epoch 1 adds a column; the diff of a pre-evolution snapshot against
    head reads old files through the evolved schema (pre-images get NULL
    for the added column)."""
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=2)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(
        _events(spark, [("c0", 0, 10, "v0", "I", 0), ("c1", 0, 11, "v0b", "I", 0)]),
        epoch_ids=[0],
    )
    evolved = _events(spark, [("c0", 0, 20, "v1", "U", 1)]).withColumn(
        "sentiment", F.lit(0.5)
    )
    engine.apply_epochs(evolved, epoch_ids=[1])
    rows = lake.table_changes(from_seq=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.conv_id, r.change_type, r.text, r.sentiment) == ("c0", "update", "v1", 0.5)
