"""Adaptive write salting: each touched bucket is split across as many
write tasks/files as its rewrite size warrants (probe batch counts +
manifest-recorded per-part rows), instead of a fixed salt that multiplies
every cold bucket's file count. The scale property under test: hot buckets
fan out, cold buckets stay one right-sized file, and the manifest's
``rows`` field sizes the NEXT epoch's rewrite correctly — with zero change
to the merged state (SURVEY §4.2 #1).
"""

from __future__ import annotations

import datetime
import os

import nifi_nlp_processor_spark.lake as lake_mod
from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.runner import CdcEngine

_TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, lsn long, op string, epoch_id long"
)


def _events(spark, rows):
    """rows: (conv_id, turn_idx, lsn, op, text, epoch_id)"""
    return spark.createDataFrame(
        [
            {"conv_id": c, "turn_idx": t, "role": "user", "text": x,
             "tool": None, "ts": _TS, "lsn": l, "op": o, "epoch_id": e}
            for c, t, l, o, x, e in rows
        ],
        SCHEMA,
    )


def _bucket_files(lake):
    """{bucket: parquet-file count} of the current snapshot's base parts."""
    out = {}
    for b, ptr in lake.last_commit()["buckets"].items():
        d = os.path.join(lake.root, ptr["path"])
        out[int(b)] = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
    return out


def test_hot_bucket_fans_out_cold_buckets_stay_single(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(lake_mod, "ROWS_PER_WRITE_TASK", 40)
    monkeypatch.setattr(lake_mod, "MAX_WRITE_SALT", 4)
    hot = [("hot", i, 1000 + i, "U", f"h{i}", 0) for i in range(160)]
    cold = [(f"c{j}", 0, 5000 + j, "U", f"v{j}", 0) for j in range(6)]
    lake = ParquetLakeTable(spark, str(tmp_path / "lk"), n_buckets=8)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(_events(spark, hot + cold), epoch_ids=[0])

    ptrs = lake.last_commit()["buckets"]
    rows_by_bucket = {int(b): p["rows"] for b, p in ptrs.items()}
    # manifest row counts are real (footer-derived), covering every live row
    assert sum(rows_by_bucket.values()) == 166
    hot_b = max(rows_by_bucket, key=rows_by_bucket.get)
    assert rows_by_bucket[hot_b] >= 160  # the hot conversation's bucket

    files = _bucket_files(lake)
    assert files[hot_b] >= 2, files  # 160 rows / 40-per-task ⇒ salt 4 (capped)
    for b, n in files.items():
        if b != hot_b:
            assert n == 1, f"cold bucket {b} salted into {n} files"

    assert lake.read().count() == 166


def test_broadcast_join_salt_path_state_identical(spark, tmp_path, monkeypatch):
    """Wide epochs switch the bucket→fan-out lookup from a literal-map scan
    to a broadcast hash join; the merged state must be identical either
    way (the salt only places rows, never picks winners)."""
    rows = [(f"c{j}", t, 100 * j + t, "U", f"v{j}-{t}", 0) for j in range(40) for t in range(3)]
    rows += [("c3", 1, 99999, "U", "c3-upd", 0), ("c5", 2, 1, "U", "stale-loser", 0)]

    def run(root):
        lake = ParquetLakeTable(spark, root, n_buckets=16)
        CdcEngine(lake=lake).apply_epochs(_events(spark, rows), epoch_ids=[0])
        return sorted(
            (r["conv_id"], r["turn_idx"], r["text"]) for r in lake.read().collect()
        )

    monkeypatch.setattr(lake_mod, "SALT_MAP_LITERAL_MAX", 0)  # force the join
    via_join = run(str(tmp_path / "a"))
    monkeypatch.setattr(lake_mod, "SALT_MAP_LITERAL_MAX", 64)
    via_map = run(str(tmp_path / "b"))
    assert via_join == via_map
    assert ("c3", 1, "c3-upd") in via_join
    assert ("c5", 2, "v5-2") in via_join


def test_pre_upgrade_manifest_without_rows_degrades_to_batch_sizing(
    spark, tmp_path, monkeypatch
):
    """A manifest written before the ``rows`` field existed must still
    merge: the salt is sized from the batch alone and the next commit
    backfills the counts."""
    import json

    monkeypatch.setattr(lake_mod, "ROWS_PER_WRITE_TASK", 40)
    lake = ParquetLakeTable(spark, str(tmp_path / "lk"), n_buckets=4)
    engine = CdcEngine(lake=lake)
    e0 = [(f"c{j}", 0, 100 + j, "U", f"v{j}", 0) for j in range(10)]
    engine.apply_epochs(_events(spark, e0), epoch_ids=[0])

    # simulate a pre-upgrade manifest: strip the rows field in place
    cdir = os.path.join(lake.root, "_commits")
    mpath = os.path.join(
        cdir, sorted(f for f in os.listdir(cdir) if f.startswith("commit-"))[-1]
    )
    c = json.load(open(mpath))
    for ptr in c["buckets"].values():
        ptr.pop("rows", None)
        for d in ptr.get("deltas", []):
            d.pop("rows", None)
    with open(mpath, "w") as fh:
        json.dump(c, fh)

    e1 = [(f"c{j}", 0, 200 + j, "U", f"w{j}", 1) for j in range(10)]
    engine2 = CdcEngine(lake=ParquetLakeTable(spark, lake.root, n_buckets=4))
    engine2.apply_epochs(_events(spark, e1), epoch_ids=[1])
    got = {r["conv_id"]: r["text"] for r in lake.read().collect()}
    assert got == {f"c{j}": f"w{j}" for j in range(10)}
    # the new commit re-records real row counts
    assert all("rows" in p for p in lake.last_commit()["buckets"].values())


def test_next_epoch_salt_sized_from_manifest_rows(spark, tmp_path, monkeypatch):
    """Epoch 1 updates ONE key of the hot conversation: the batch alone
    (1 row) would pick salt 1, but the CoW rewrite re-emits the 160 target
    rows — the manifest's per-part ``rows`` must drive the fan-out."""
    monkeypatch.setattr(lake_mod, "ROWS_PER_WRITE_TASK", 40)
    monkeypatch.setattr(lake_mod, "MAX_WRITE_SALT", 4)
    hot = [("hot", i, 1000 + i, "U", f"h{i}", 0) for i in range(160)]
    upd = [("hot", 7, 9999, "U", "h7-fixed", 1)]
    lake = ParquetLakeTable(spark, str(tmp_path / "lk"), n_buckets=8)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(_events(spark, hot + upd), epoch_ids=[0, 1])

    files = _bucket_files(lake)
    rows_by_bucket = {
        int(b): p["rows"] for b, p in lake.last_commit()["buckets"].items()
    }
    hot_b = max(rows_by_bucket, key=rows_by_bucket.get)
    assert files[hot_b] >= 2, files
    got = {r["turn_idx"]: r["text"] for r in lake.read().collect()}
    assert got[7] == "h7-fixed" and len(got) == 160
