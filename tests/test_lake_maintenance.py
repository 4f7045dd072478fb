"""Snapshot maintenance: expire_snapshots (Iceberg expire analogue) and
time travel. Manifests are never deleted — they are the exactly-once epoch
ledger — only data directories referenced by no retained manifest go."""

from __future__ import annotations

import datetime
import os

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
             "tool": None, "ts": _TS, "lsn": l, "op": "U", "epoch_id": e}
            for c, t, l, x, e in rows
        ],
        SCHEMA,
    )


def _data_dirs(root):
    d = os.path.join(root, "data")
    return sorted(os.listdir(d)) if os.path.exists(d) else []


@pytest.fixture()
def lake3(spark, tmp_path):
    """Three epochs: 0 spans many conversations (touches many buckets),
    1 touches a single conversation (one bucket), 2 spans many again."""
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=4)
    engine = CdcEngine(lake=lake)
    wide0 = [(f"c{i}", 0, 10 + i, f"v0-{i}", 0) for i in range(12)]
    narrow = [("c3", 0, 100, "v1-narrow", 1)]
    wide2 = [(f"c{i}", 0, 200 + i, f"v2-{i}", 2) for i in range(12)]
    engine.apply_epochs(_events(spark, wide0 + narrow + wide2), epoch_ids=[0, 1, 2])
    return lake


def test_expire_keeps_referenced_old_dirs(spark, lake3):
    # commit 2 (narrow epoch) rewrote ONE bucket and inherits pointers
    # into c1 for every untouched bucket — so with keep_last=2, c1 is
    # still live through commit 2's inherited references and NOTHING may
    # be reclaimed. This is the property that makes pointer-inheriting
    # copy-on-write safe to vacuum.
    before = {tuple(r) for r in lake3.read().collect()}
    out = lake3.expire_snapshots(keep_last=2)
    assert out["removed_dirs"] == []
    assert _data_dirs(lake3.root) == ["c00000001", "c00000002", "c00000003"]
    assert {tuple(r) for r in lake3.read().collect()} == before
    # time travel to seq 2 still works after the no-op vacuum
    assert ("c3", "v1-narrow") in {
        (r.conv_id, r.text) for r in lake3.read(at_seq=2).collect()
    }


def test_expire_to_head_only(spark, lake3):
    before = {tuple(r) for r in lake3.read().collect()}
    out = lake3.expire_snapshots(keep_last=1)
    # head (seq 3) rewrote every bucket, so both older dirs go
    assert out["removed_dirs"] == ["c00000001", "c00000002"]
    assert _data_dirs(lake3.root) == ["c00000003"]
    assert {tuple(r) for r in lake3.read().collect()} == before
    # the epoch ledger survives: re-applying any epoch is still a no-op
    assert lake3.committed_epochs() == {0, 1, 2}
    res = CdcEngine(lake=lake3).apply_epochs(
        _events(spark, [("c1", 0, 999, "replay", 0)]), epoch_ids=[0]
    )
    assert res[0].merge.skipped
    assert {tuple(r) for r in lake3.read().collect()} == before


def test_time_travel_reads_old_state(spark, lake3):
    # seq 1 = after epoch 0 only
    s1 = {(r.conv_id, r.text) for r in lake3.read(at_seq=1).collect()}
    assert s1 == {(f"c{i}", f"v0-{i}") for i in range(12)}
    # seq 2 = epoch 1's narrow update applied on top
    s2 = {(r.conv_id, r.text) for r in lake3.read(at_seq=2).collect()}
    assert ("c3", "v1-narrow") in s2 and ("c3", "v0-3") not in s2
    # head unchanged semantics
    assert lake3.read(at_seq=3).count() == lake3.read().count()
    with pytest.raises(ValueError, match="no snapshot"):
        lake3.read(at_seq=99)


def test_time_travel_after_expire_raises(spark, lake3):
    lake3.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        lake3.read(at_seq=1).collect()
    # retained head still reads
    assert lake3.read(at_seq=3).count() == 12


def test_expire_spares_inflight_orphan(spark, lake3):
    # a dir beyond the ledger head may be an unpublished in-flight write
    orphan = os.path.join(lake3.root, "data", "c00000099")
    os.makedirs(orphan)
    out = lake3.expire_snapshots(keep_last=1)
    assert "c00000099" not in out["removed_dirs"]
    assert os.path.exists(orphan)


def test_expire_keep_last_zero_rejected(lake3):
    with pytest.raises(ValueError):
        lake3.expire_snapshots(keep_last=0)
