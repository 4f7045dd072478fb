"""Watermarked windowed aggregation (streaming/windowed.py): append-mode
emit-once, late-data acceptance inside the watermark, drop beyond it, and
watermark persistence across a checkpointed restart — all with controlled
batch delivery (one drain per staged file set, same checkpoint)."""

from __future__ import annotations

import datetime
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.streaming import windowed_counts  # noqa: E402


def _t(h, m):
    return datetime.datetime(2026, 3, 1, h, m)


def _write(spark, path, rows, mode="append"):
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode(mode).parquet(path)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    return {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }


def test_late_data_semantics_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: events at 10:05 and 12:05 -> watermark 11:05 after the
    # drain; only window [10,11) has closed
    _write(spark, src, [(_t(10, 5), "a", 1.0), (_t(12, 5), "a", 2.0)])
    got = _drain(spark, src, out, ckpt)
    assert got == {(_t(10, 0), "a"): (1, 1.0)}

    # batch 2 against the RESTORED watermark (11:05):
    #  * 11:30 is late (older than the max seen) but its window's end
    #    (12:00) is past the watermark -> accepted
    #  * 10:45's window closed at 11:00 <= 11:05 -> dropped
    #  * 15:05 pushes the watermark to 14:05 -> [11,12) and [12,13) emit
    _write(
        spark,
        src,
        [(_t(11, 30), "a", 4.0), (_t(10, 45), "a", 8.0), (_t(15, 5), "a", 16.0)],
    )
    got = _drain(spark, src, out, ckpt)
    assert got == {
        (_t(10, 0), "a"): (1, 1.0),   # unchanged: the 10:45 event was dropped
        (_t(11, 0), "a"): (1, 4.0),   # the late-but-in-time event landed
        (_t(12, 0), "a"): (1, 2.0),
    }
    # [15,16) is still open -> absent until more data closes it


def test_batch_and_stream_agree_under_cutoff(spark, tmp_path):
    rows = [
        (_t(9, i % 60), "a" if i % 3 else "b", float(i)) for i in range(40)
    ] + [(_t(13, 0), "a", 1.0)]
    src = str(tmp_path / "src")
    _write(spark, src, rows)
    got = _drain(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    cut = _t(13, 0) - datetime.timedelta(hours=1)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_counts(ev).where(F.col("window_end") <= F.lit(cut)).collect()
    }
    assert got == want


def test_batch_plan_is_partial_final_aggregate(spark):
    ev = spark.createDataFrame(
        [(_t(9, 0), "a", 1.0)], "ts timestamp, event_type string, value double"
    )
    plan = (
        windowed_counts(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower()  # map-side combine before the shuffle
