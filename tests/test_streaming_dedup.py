"""Streaming retry-suppression (streaming/dedup.py): duplicates inside the
watermark are dropped — including across a checkpointed restart — and
duplicates arriving after state eviction are re-emitted (the documented
at-least-once boundary that keeps the downstream merge LWW-idempotent)."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.streaming import dedup_stream  # noqa: E402


def _t(h, m=0):
    return datetime.datetime(2026, 3, 1, h, m)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "lsn long, ts timestamp, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt, watermark="1 hour"):
    stream = spark.readStream.schema("lsn long, ts timestamp, text string").parquet(src)
    q = (
        dedup_stream(stream, keys=("lsn",), watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    return sorted(
        (r.lsn, r.ts, r.text) for r in spark.read.parquet(out).collect()
    )


def test_intra_batch_duplicates_collapse(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, [(1, _t(10), "a"), (1, _t(10), "a"), (2, _t(10, 5), "b")])
    got = _drain(spark, src, out, ckpt)
    assert got == [(1, _t(10), "a"), (2, _t(10, 5), "b")]


def test_cross_restart_duplicate_within_watermark_dropped(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, [(1, _t(10), "a"), (2, _t(10, 30), "b")])
    _drain(spark, src, out, ckpt)
    # retry of lsn 1 arrives in the next drain; state watermark is
    # 9:30 (10:30 - 1h), lsn 1's entry (ts 10:00) is still held -> dropped
    _write(spark, src, [(1, _t(10), "a"), (3, _t(10, 40), "c")])
    got = _drain(spark, src, out, ckpt)
    assert got == [(1, _t(10), "a"), (2, _t(10, 30), "b"), (3, _t(10, 40), "c")]


def test_duplicate_beyond_watermark_reemitted(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, [(1, _t(8), "a"), (2, _t(12), "b")])
    _drain(spark, src, out, ckpt)
    # watermark is now 11:00; lsn 1 (ts 8:00) was evicted from state, so
    # its very late retry shows up again — at-least-once, by design.
    # (A brand-new event also older than the watermark is dropped by the
    # late-row filter, so the retry must carry a fresh-enough timestamp.)
    _write(spark, src, [(1, _t(11, 30), "a")])
    got = _drain(spark, src, out, ckpt)
    assert (1, _t(11, 30), "a") in got and len(got) == 3


def test_batch_fallback_dedups(spark):
    df = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(10), "a")], "lsn long, ts timestamp, text string"
    )
    assert dedup_stream(df, keys=("lsn",)).count() == 1
