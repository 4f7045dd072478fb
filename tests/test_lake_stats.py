"""Manifest column statistics + stats-pruned reads (lake.read_where):
per-part min/max recorded at write, whole-bucket skipping that never opens
out-of-range file sets, MoR-safety of the bucket granularity, and stats
persistence through compaction and reopen."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.runner import CdcEngine

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, lsn long, op string, epoch_id long"
)


def _t(month, day=1):
    return datetime.datetime(2026, month, day)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {"conv_id": c, "turn_idx": t, "role": "user", "text": x,
             "tool": None, "ts": ts, "lsn": l, "op": op, "epoch_id": e}
            for c, t, l, x, ts, op, e in rows
        ],
        SCHEMA,
    )


def _mk(spark, tmp_path, **kw):
    lake = ParquetLakeTable(
        spark, str(tmp_path / "lake"), n_buckets=4,
        stats_cols=("ts", "turn_idx"), **kw,
    )
    return lake, CdcEngine(lake=lake)


# many conv ids so every bucket gets rows; conv i carries ts month (i % 6) + 1
ROWS = [
    (f"c{i}", 0, 10 + i, f"v{i}", _t((i % 6) + 1), "I", 0)
    for i in range(24)
]


def test_stats_recorded_per_part(spark, tmp_path):
    lake, eng = _mk(spark, tmp_path)
    eng.apply_epoch(_events(spark, ROWS), 0)
    ptrs = lake.last_commit()["buckets"]
    assert ptrs
    for ptr in ptrs.values():
        st = ptr["stats"]
        assert set(st) == {"ts", "turn_idx"}
        lo, hi = st["ts"]
        assert lo <= hi and lo.startswith("2026-")
        assert st["turn_idx"] == [0, 0]


def test_read_where_equals_naive_filter_and_skips_files(spark, tmp_path):
    # stats pruning bites only when the stats column is CLUSTERED within
    # buckets (the reason Iceberg pairs stats with sort orders): give each
    # conversation a timestamp month equal to its bucket id + 1, so every
    # bucket spans exactly one month
    buckets = {
        r[0]: r[1]
        for r in spark.createDataFrame([(f"c{i}",) for i in range(24)], "conv_id string")
        .select("conv_id", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int").alias("b"))
        .collect()
    }
    rows = [
        (f"c{i}", 0, 10 + i, f"v{i}", _t(buckets[f"c{i}"] + 1), "I", 0)
        for i in range(24)
    ]
    lake, eng = _mk(spark, tmp_path)
    eng.apply_epoch(_events(spark, rows), 0)
    lo, hi = _t(2), _t(2, 28)
    naive = sorted(
        tuple(r)
        for r in lake.read()
        .where((F.col("ts") >= lo) & (F.col("ts") <= hi))
        .select("conv_id", "text")
        .collect()
    )
    pruned_df = lake.read_where({"ts": (lo, hi)})
    got = sorted(tuple(r) for r in pruned_df.select("conv_id", "text").collect())
    assert got == naive and got
    # the point: out-of-range buckets' files are never opened
    assert len(pruned_df.inputFiles()) < len(lake.read_raw().inputFiles())


def test_open_ended_ranges(spark, tmp_path):
    lake, eng = _mk(spark, tmp_path)
    eng.apply_epoch(_events(spark, ROWS), 0)
    n_ge = lake.read_where({"ts": (_t(5), None)}).count()
    n_le = lake.read_where({"ts": (None, _t(4, 28))}).count()
    assert n_ge == sum(1 for r in ROWS if r[4] >= _t(5))
    assert n_le == sum(1 for r in ROWS if r[4] <= _t(4, 28))


def test_mor_bucket_granularity_is_safe(spark, tmp_path):
    # base version of a key in range, MoR delta moves it OUT of range: the
    # bucket is still read (one part in range), the fold resolves to the
    # delta version, and the row-level filter drops it — never resurrected
    lake, _ = _mk(spark, tmp_path)
    eng = CdcEngine(lake=lake, merge_mode="mor")
    eng.apply_epoch(_events(spark, [("k", 0, 10, "jan", _t(1), "I", 0)]), 0)
    eng.apply_epoch(_events(spark, [("k", 0, 20, "jun", _t(6), "U", 1)]), 1)
    got = lake.read_where({"ts": (_t(1), _t(2))}).select("conv_id", "text").collect()
    assert got == []  # latest version is June; January must not resurrect
    got = lake.read_where({"ts": (_t(5), None)}).select("text").collect()
    assert [r.text for r in got] == ["jun"]


def test_stats_survive_compaction_and_reopen(spark, tmp_path):
    lake, _ = _mk(spark, tmp_path)
    eng = CdcEngine(lake=lake, merge_mode="mor")
    eng.apply_epoch(_events(spark, ROWS[:12]), 0)
    eng.apply_epoch(_events(spark, ROWS[12:]), 1)
    lake.compact(min_files=1)
    # a fresh handle adopts stats_cols from table metadata and the
    # compacted parts carry fresh stats
    lake2 = ParquetLakeTable(spark, lake.root)
    assert lake2.stats_cols == ["ts", "turn_idx"]
    for ptr in lake2.last_commit()["buckets"].values():
        if not ptr.get("deltas"):
            assert "stats" in ptr
    lo, hi = _t(2), _t(3, 28)
    naive = sorted(
        tuple(r)
        for r in lake2.read()
        .where((F.col("ts") >= lo) & (F.col("ts") <= hi))
        .select("conv_id", "text").collect()
    )
    got = sorted(
        tuple(r)
        for r in lake2.read_where({"ts": (lo, hi)}).select("conv_id", "text").collect()
    )
    assert got == naive and got


def test_no_stats_configured_reads_everything(spark, tmp_path):
    lake = ParquetLakeTable(spark, str(tmp_path / "plain"), n_buckets=4)
    eng = CdcEngine(lake=lake)
    eng.apply_epoch(_events(spark, ROWS), 0)
    assert all("stats" not in p for p in lake.last_commit()["buckets"].values())
    # read_where still computes the right answer — it just can't skip
    lo, hi = _t(2), _t(3, 28)
    assert lake.read_where({"ts": (lo, hi)}).count() == sum(
        1 for r in ROWS if lo <= r[4] <= hi
    )
