"""Streaming observability: a durable per-micro-batch progress ledger.

The lake's commit manifests already export per-epoch lineage (rows
applied, conflict counts, LSN watermarks — ``CdcEngine.lineage``); this
module adds the RUNTIME half the north rule's "exported as metrics" needs
for the streaming path: every micro-batch's input rate, processing rate,
batch duration, watermark and state-store footprint, appended as one JSON
line per event to a local ledger file. That is what a fleet scrapes to
answer "is ingest keeping up with the binlog?" — lag is visible as
``inputRowsPerSecond > processedRowsPerSecond`` sustained, state growth as
``stateRowsTotal`` trending up.

Implementation: a ``StreamingQueryListener`` (driver-side callback, zero
executor cost) writing line-buffered JSONL. Events are appended, never
rewritten, so a crashed driver leaves a readable prefix. Listener
callbacks are asynchronous — readers of a live ledger must tolerate the
tail lagging the query by a beat (``read_ledger`` just parses whatever has
landed)."""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLedger(StreamingQueryListener):
    """Appends one JSON line per streaming event to ``path``."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _append(self, row: dict) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id), "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "event": "progress",
            "id": str(p.id),
            "batchId": p.batchId,
            "timestamp": p.timestamp,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs or {}),
            "eventTime": dict(p.eventTime or {}),
            "stateRowsTotal": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
            "stateBytes": sum(
                s.memoryUsedBytes for s in (p.stateOperators or [])
            ),
        }
        self._append(row)

    def onQueryIdle(self, event) -> None:
        self._append({"event": "idle", "id": str(event.id)})

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )


@contextmanager
def progress_ledger(spark: SparkSession, path: str):
    """Attach a ``ProgressLedger`` for the scope of a streaming run; the
    listener is removed on exit even when the body raises, so a bench
    session never leaks callbacks into later queries."""
    listener = ProgressLedger(path)
    spark.streams.addListener(listener)
    try:
        yield listener
    finally:
        spark.streams.removeListener(listener)


def read_ledger(path: str) -> list[dict]:
    """Parse whatever has landed in the ledger (tolerates a mid-write tail
    line by skipping unparseable trailing content)."""
    out: list[dict] = []
    if not os.path.exists(path):
        return out
    with open(path) as fh:
        for line in fh:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                break
    return out
