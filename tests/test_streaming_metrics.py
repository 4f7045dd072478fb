"""Streaming progress ledger (streaming/metrics.py): per-batch metrics
land as JSONL, the listener detaches cleanly, and the ledger reads back
through a torn tail."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.streaming import progress_ledger, read_ledger


def _wait_for(pred, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_ledger_records_progress_and_termination(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "metrics.jsonl")
    spark.range(1000).selectExpr("id", "cast(id as string) s").coalesce(2).write.parquet(src)

    with progress_ledger(spark, ledger):
        q = (
            spark.readStream.schema("id long, s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # listener callbacks are async — poll for the terminated event
        assert _wait_for(
            lambda: any(r["event"] == "terminated" for r in read_ledger(ledger))
        )

    rows = read_ledger(ledger)
    kinds = [r["event"] for r in rows]
    assert kinds[0] == "started" and "terminated" in kinds
    prog = [r for r in rows if r["event"] == "progress" and r["numInputRows"] > 0]
    # maxFilesPerTrigger=1 over 2 files -> at least 2 data batches
    assert len(prog) >= 2
    assert sum(r["numInputRows"] for r in prog) == 1000
    assert all("durationMs" in r for r in prog)


def test_listener_detaches_after_scope(spark, tmp_path):
    src = str(tmp_path / "src2")
    ledger = str(tmp_path / "m2.jsonl")
    spark.range(10).write.parquet(src)
    with progress_ledger(spark, ledger):
        pass
    # a query run AFTER the scope must not append to the ledger
    q = (
        spark.readStream.schema("id long")
        .parquet(src)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    time.sleep(2)
    assert read_ledger(ledger) == []


def test_read_ledger_tolerates_torn_tail(tmp_path):
    p = str(tmp_path / "torn.jsonl")
    with open(p, "w") as fh:
        fh.write('{"event": "started", "id": "x", "runId": "y"}\n')
        fh.write('{"event": "progre')  # crashed mid-write
    rows = read_ledger(p)
    assert len(rows) == 1 and rows[0]["event"] == "started"
