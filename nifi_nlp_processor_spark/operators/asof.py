"""As-of (temporal) join — attach to each left row the most recent right
row at or before it, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive formulations
are both scale-broken: an inequality join (``l.ts >= r.ts``) explodes to
O(|L|·|R|) per key before a window prunes it, and a per-key
``applyInPandas`` ships whole keys through Python. This operator is the
canonical shuffle-once composition instead:

1. tag both sides and union them (right rows carry their payload, left
   rows carry null payload),
2. one hash shuffle on the join key + one in-partition sort by
   ``(ts, side, tie)`` — right rows sort BEFORE a left row with the same
   timestamp, giving inclusive ``right.ts <= left.ts`` semantics,
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT ROW carries the latest right payload forward to every left
   row.

Cost at 100 TB: exactly one Exchange on the key and one sort — the same
shape as a co-partitioned merge join, with zero pair explosion no matter
how many right rows precede a left row. The window frame ending at
CURRENT ROW keeps Spark's running-frame implementation (no
re-evaluation per row), and everything stays in JVM whole-stage codegen
(``WindowExec`` breaks codegen for the window itself but never falls to
Python).

Skew note: the window needs ALL rows of one key in one partition, so a
mega-key cannot be salt-split (unlike the CDC LWW aggregate) — the
mitigation at scale is range-partitioning within key by time and
carrying boundary rows, which this module deliberately does not do until
a real workload needs it; AQE cannot split a window partition either.

Reference parity note: the NiFi reference has no temporal join — this is
one of the training-data-pipeline additions (enriching transcript turns
/ events with the latest prior state of a slowly-changing attribute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    *,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    tie_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload_cols`` (and the
    timestamp, as ``{ts_col}{suffix}``) from the matching ``right`` row.

    backward: match = right row with the greatest ``ts_col`` <= left's.
    forward:  match = right row with the smallest ``ts_col`` >= left's.
    Unmatched left rows keep null payload (left-outer semantics).

    ``tie_col`` breaks ties among right rows sharing one timestamp (the
    greatest ``tie_col`` wins, e.g. an LSN/event id) — required for a
    deterministic result when (key, ts) is not unique on the right.

    ``tolerance_sec`` nulls the match back out when the matched right row
    is further than this many seconds from the left row (pandas
    ``merge_asof(tolerance=...)`` semantics); the join cost is identical,
    the filter is a post-hoc column expression.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    # side ordering: the right row must sort before (backward) / after
    # (forward) a left row with the SAME timestamp so the frame ending at
    # CURRENT ROW includes it inclusively.
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        payload.alias("_p"),
    )
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        *[F.col(c) for c in on],
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(2**63 - 1).alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    u = r.select(F.lit(None).cast(l.schema["_row"].dataType).alias("_row"), "*").unionByName(l)

    # _side separates right-before-left at equal timestamps in both
    # directions; _tie asc makes the GREATEST tie_col the last right row
    # the running frame sees (so it wins) in both directions too.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col("_tie").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the window runs over the UNION (right rows feed the running last);
    # the left-only filter comes after it.
    matched = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select("_row", "_m")
    )
    if tolerance_sec is not None:
        gap = F.abs(
            F.col("_row")[ts_col].cast("double") - F.col("_m")["_ts"].cast("double")
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("_m"))
        )
    out = matched.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
