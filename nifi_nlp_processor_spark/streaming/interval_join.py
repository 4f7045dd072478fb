"""Watermarked stream-stream interval join — event-time correlation of two
live streams (the attribution / request-response pattern).

The reference correlates records only within one FlowFile; a Spark-first
engine gets cross-stream correlation from Structured Streaming's
stream-stream join: both sides are watermarked, the join condition carries
an event-time interval (``right.ts ∈ [left.ts, left.ts + upper]``), and the
runtime buffers each side's rows in join state ONLY until the watermark
proves no future match can arrive — state per key is O(rows within the
interval + watermark delay), never the whole stream. That bounded-state
property is what makes the operator viable on an unbounded 10^10-event
feed; an unwatermarked join would be rejected by Spark outright in append
mode.

Semantics (tests/test_streaming_interval_join.py proves them):

* an INNER interval join emits a pair in the micro-batch where the match
  completes — no result is withheld, so an availableNow drain over a fully
  staged source yields exactly the batch join (the registry oracle);
* rows older than the watermark on either side are evicted from state and
  can no longer produce pairs — late left rows beyond the delay silently
  lose their matches, same contract as every watermarked op;
* the same plan runs on batch DataFrames (watermark is a no-op), so
  callers can diff stream vs batch output to quantify watermark loss.

At scale the join shuffles both sides once on the equality key; the range
predicate is evaluated within the key's state store, so there is no
range-explosion exchange. Skewed keys (one user with millions of events)
are bounded by the interval: state holds only ``upper + watermark`` worth
of that key's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "INTERVAL 30 MINUTES",
    watermark: str | None = "1 hour",
    prefixes: tuple[str, str] = ("l_", "r_"),
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: pairs ``(l, r)`` sharing ``on`` with
    ``r.ts in [l.ts, l.ts + upper]``; ``how`` is ``inner`` or
    ``left_outer``.

    Works on two streaming DataFrames (both watermarked — required for
    state eviction in a stream-stream join) and on batch DataFrames (the
    watermark calls are no-ops). Pass ``watermark=None`` when the inputs
    are ALREADY watermarked upstream — e.g. both sides filtered out of one
    watermarked feed. That placement matters: a watermark node placed
    above a selective filter sees only that side's rows, so a side with no
    traffic pins the min-policy global watermark at 0 and join state never
    evicts. Output columns are the union of both sides' columns,
    disambiguated with ``prefixes``.

    LEFT OUTER semantics (the attribution query users actually run — every
    trigger, matched or not): matched pairs emit in the micro-batch where
    the match completes, exactly like inner; an UNMATCHED left row emits
    its null-padded row only when the watermark proves no match can still
    arrive — i.e. when the row is evicted from join state, at watermark >
    ``l.ts + upper``. Left rows whose interval is still open when the
    stream drains stay in state and emit nothing — the cutoff a correct
    oracle must reproduce (see the registry's outer-join oracle).
    """
    if how not in ("inner", "left_outer"):
        # other join types would run, but with prefix/watermark/eviction
        # assumptions this contract (and the registry oracle) never covers
        raise ValueError(f"interval_join supports 'inner' or 'left_outer', got {how!r}")
    lp, rp = prefixes
    l = left.select([F.col(c).alias(f"{lp}{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"{rp}{c}") for c in right.columns])
    if watermark is not None:
        if l.isStreaming:
            l = l.withWatermark(f"{lp}{left_ts}", watermark)
        if r.isStreaming:
            r = r.withWatermark(f"{rp}{right_ts}", watermark)
    lt, rt = F.col(f"{lp}{left_ts}"), F.col(f"{rp}{right_ts}")
    cond = (
        (F.col(f"{lp}{on}") == F.col(f"{rp}{on}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(upper))
    )
    return l.join(r, cond, how)


def attribution_pairs(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    within: str = "INTERVAL 30 MINUTES",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Attribution over one event feed: every ``trigger_type`` event joined
    to each same-user ``outcome_type`` event that follows within
    ``within``. The single input may be a stream — both join sides derive
    from it by filter. The watermark is applied to the feed BEFORE the
    type filters so every event (matching either type or neither) advances
    it; watermarking after the filter would let a quiet side freeze the
    global min-watermark and join state would grow without bound. Returns
    one row per (trigger, outcome) pair with the delay in seconds;
    ``how="left_outer"`` additionally emits null-padded rows for triggers
    with NO outcome once the watermark closes their interval (state
    eviction — see ``interval_join``)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)

    def _is(event_type: str):
        # single non-splittable predicate that REFERENCES ts: Catalyst's
        # PushPredicateThroughNonJoin pushes any predicate not referencing
        # the watermark column below the EventTimeWatermark node, which
        # would stop non-matching events (e.g. views) from advancing the
        # watermark — the quiet-side stall this pre-filter placement
        # exists to avoid. when(type-match, ts).isNotNull() is exactly
        # (event_type = X AND ts IS NOT NULL) but cannot be split, so the
        # filter stays above the watermark and every event feeds it.
        return F.when(F.col("event_type") == event_type, F.col("ts")).isNotNull()

    trig = src.where(_is(trigger_type)).select("event_id", "user_id", "ts")
    outc = src.where(_is(outcome_type)).select("event_id", "user_id", "ts", "value")
    j = interval_join(
        trig, outc, on="user_id", upper=within, watermark=None,
        prefixes=("c_", "p_"), how=how,
    )
    return j.select(
        F.col("c_event_id").alias("trigger_id"),
        F.col("p_event_id").alias("outcome_id"),
        F.col("c_user_id").alias("user_id"),
        # whole-second floor of the µs difference — sub-second-exact and
        # reproducible bit-for-bit in ANSI SQL (epoch_us), unlike
        # unix_timestamp which truncates each operand independently
        F.floor(
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / F.lit(1_000_000)
        ).cast("bigint").alias("delay_sec"),
        F.col("p_value").alias("outcome_value"),
    )
