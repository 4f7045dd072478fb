"""Stateful streaming sessionization (applyInPandasWithState): per-user
session state survives across micro-batches AND across query restarts
(state lives in the checkpoint); closed sessions are emitted append-mode
exactly once."""

from __future__ import annotations

import datetime
import os

from nifi_nlp_processor_spark.streaming import sessionize_stream

BASE = datetime.datetime(2026, 1, 1)
SCHEMA = "user_id long, ts timestamp"


def _write(spark, src, rows, n):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _sessions(spark, out):
    if not any(f.endswith(".parquet") for _, _, fs in os.walk(out) for f in fs):
        return set()
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }


def _t(sec):
    return BASE + datetime.timedelta(seconds=sec)


def test_sessionize_stream_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # delivery 1: user 1 has three close events; user 2 two
    _write(spark, src, [(1, _t(0)), (1, _t(10)), (1, _t(20)), (2, _t(0)), (2, _t(5))], 1)
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == set()  # nothing closed yet

    # delivery 2 (new query, same checkpoint): user 1 jumps past the gap —
    # the session held in state closes; user 2 stays within the gap
    _write(spark, src, [(1, _t(2000)), (2, _t(100))], 2)
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == {(1, _t(0), _t(20), 3)}

    # delivery 3: both users jump past the gap — their running sessions close
    _write(spark, src, [(1, _t(5000)), (2, _t(5000))], 3)
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == {
        (1, _t(0), _t(20), 3),
        (1, _t(2000), _t(2000), 1),
        (2, _t(0), _t(100), 3),
    }


def test_sessionize_multiple_gaps_in_one_batch(spark, tmp_path):
    """Two gap crossings inside a single delivery close two sessions at
    once; the newest run stays open in state."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(
        spark, src,
        [(7, _t(0)), (7, _t(100)), (7, _t(3000)), (7, _t(3100)), (7, _t(9000))],
        1,
    )
    _run(spark, src, out, ckpt)
    assert _sessions(spark, out) == {
        (7, _t(0), _t(100), 2),
        (7, _t(3000), _t(3100), 2),
    }
