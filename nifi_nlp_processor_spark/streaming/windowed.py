"""Watermarked event-time windowed aggregation — the Structured Streaming
building block for late-data-tolerant rollups over the change/event stream.

The reference processes FlowFiles one at a time and has no event-time
notion; a Spark-first engine gets late-data handling from the runtime:
``withWatermark`` bounds how long a window stays open for stragglers, the
windowed aggregate keeps per-window partial state, and append mode emits a
window exactly once — when the watermark passes its end. State per key is
O(open windows), bounded by (watermark delay / window size) + 1.

Semantics worth spelling out (tests/test_streaming_windowed.py proves
them):

* an event arriving AFTER its window closed but WITHIN the watermark delay
  still lands in the right window (the window hasn't emitted yet);
* an event older than the watermark is dropped — silently by Spark, so
  ``windowed_counts`` exposes the same aggregation for batch DataFrames
  too, letting callers diff stream vs batch to quantify the drop;
* the final windows (end > max_event_time - delay) never emit in an
  availableNow drain — they are still open. Callers reconciling against a
  batch recompute must apply the same cutoff (the registry oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows with per-key counts and exact-decimal
    value sums (cast back to double — the cross-engine hash pattern used
    by every money-sum in the registry). Works on a streaming DataFrame
    (watermark applied, append-mode-ready) and on a batch DataFrame (the
    watermark call is a no-op there), so the same plan serves both the
    live path and the reconciliation recompute."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )
