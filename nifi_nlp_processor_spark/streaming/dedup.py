"""Streaming de-duplication of at-least-once deliveries.

A CDC transport (Debezium/Kafka-style) re-delivers events on producer
retry and consumer rebalance. The LWW merge makes re-applies harmless
(idempotent by max-LSN), but every duplicate still costs a full trip
through enrichment + shuffle + MERGE; dropping them at ingest with
``dropDuplicatesWithinWatermark`` keeps O(1) state per key bounded by the
watermark delay instead of unbounded ``dropDuplicates`` state.

Honest semantics (tests/test_streaming_dedup.py): a duplicate arriving
WITHIN the watermark delay of its first delivery is dropped; one arriving
later is re-emitted — the state that remembered it has been evicted. That
is the documented at-least-once boundary, and it is exactly why the
downstream merge stays LWW-idempotent rather than assuming exactly-once."""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("lsn",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop re-deliveries by identity key within the watermark window.
    Rows are emitted immediately on first sight (no append-mode window
    latency); state holds one entry per distinct key seen in the last
    ``watermark`` of event time."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
        return events.dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))
