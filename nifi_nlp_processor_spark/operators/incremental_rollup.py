"""Incremental aggregate maintenance from the lake changelog.

A downstream rollup (per-conversation counts, sums, sizes) over a CDC
target is normally recomputed by scanning the whole table. With the net
changelog between two snapshots (``ParquetLakeTable.table_changes(...,
images="both")``) the algebraic aggregates — count, sum of any expression
of the row — can instead be maintained by retraction: every change row
contributes ``-f(pre)`` and ``+f(post)``, the deltas are summed per group,
and the result is merged into the previous rollup.

Scale shape (the reason this exists): the work is O(changed keys), not
O(table). ``table_changes`` already prunes to buckets whose manifest
pointer moved; the delta aggregation shuffles only (group, delta) pairs;
the final merge is a full-outer join on the group key between the old
rollup and the (small) delta set. At 100 TB a nightly rollup recompute
scans everything — this path touches exactly what changed.

Grouping columns must be a subset of the lake's merge keys: key columns
cannot change in an update, so a row never migrates between groups and
each change contributes to exactly one group. (Grouping by a mutable
payload column would need the pre-group/post-group split — out of scope
until something needs it.) Only ALGEBRAIC aggregates are offered; min/max
are not retractable (a delete of the current max forces a per-group
recompute) and callers who need them should recompute affected groups.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# an aggregate spec: output column -> fn(row-image struct) giving the
# row's additive contribution; count is the special-cased `lit(1)`
AggSpec = dict[str, Callable[[Column], Column]]


def rollup_deltas(
    changes: DataFrame,
    group_cols: list[str],
    aggs: AggSpec,
) -> DataFrame:
    """Per-group additive deltas from a ``images="both"`` changelog:
    ``sum(f(post)) - sum(f(pre))`` per group for every agg, plus the row
    count delta ``n_rows``. Inserts have NULL pre, deletes NULL post —
    the conditional contribution handles all three change types in one
    expression, so this is a single partial+final aggregation."""

    def contrib(fn: Callable[[Column], Column]) -> Column:
        # each side is coalesced to 0 INDEPENDENTLY: fn over a NULL field
        # (e.g. length(tool) where tool is NULL) must contribute 0, not
        # poison the whole plus-minus into NULL — an update from NULL to a
        # value would otherwise silently drop its delta. This matches the
        # recompute semantics exactly: sum() skips NULL rows, which is the
        # same total as summing 0 for them.
        plus = F.when(
            F.col("post").isNotNull(), F.coalesce(fn(F.col("post")), F.lit(0))
        ).otherwise(F.lit(0))
        minus = F.when(
            F.col("pre").isNotNull(), F.coalesce(fn(F.col("pre")), F.lit(0))
        ).otherwise(F.lit(0))
        return plus - minus

    terms = [F.sum(contrib(lambda _: F.lit(1))).alias("n_rows")] + [
        F.sum(contrib(fn)).alias(name) for name, fn in aggs.items()
    ]
    return changes.groupBy(*group_cols).agg(*terms)


def apply_rollup_deltas(
    prev: DataFrame | None,
    deltas: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Merge per-group deltas into the previous rollup: full-outer join on
    the group key, add every measure, drop groups whose row count reaches
    zero (all their rows were deleted). ``prev=None`` bootstraps from the
    deltas alone. Column sets must match (same AggSpec both times)."""
    if prev is None:
        return deltas.where(F.col("n_rows") > 0)
    measures = [c for c in deltas.columns if c not in group_cols]
    if sorted(measures) != sorted(c for c in prev.columns if c not in group_cols):
        raise ValueError(
            f"rollup schemas differ: prev has "
            f"{sorted(c for c in prev.columns if c not in group_cols)}, "
            f"deltas have {sorted(measures)}"
        )
    p = prev.select(
        *group_cols, *[F.col(c).alias(f"_p_{c}") for c in measures]
    )
    d = deltas.select(
        *group_cols, *[F.col(c).alias(f"_d_{c}") for c in measures]
    )
    merged = p.join(d, group_cols, "full_outer").select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(f"_p_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in measures
        ],
    )
    return merged.where(F.col("n_rows") > 0)


def incremental_rollup(
    lake,
    from_seq: int,
    group_cols: list[str],
    aggs: AggSpec,
    prev: DataFrame | None = None,
    to_seq: int | None = None,
) -> DataFrame:
    """Maintain a rollup across lake snapshots: read the net changelog
    ``from_seq -> to_seq`` with both images, turn it into per-group deltas,
    and apply them to ``prev`` (the rollup as of ``from_seq``). The result
    equals recomputing the same aggregation over the ``to_seq`` snapshot —
    the registry query ``cdc_incr_rollup`` proves that equivalence against
    the DuckDB full-recompute oracle."""
    missing = [c for c in group_cols if c not in lake.key_cols]
    if missing:
        raise ValueError(
            f"group cols {missing} are not lake merge keys; incremental "
            "maintenance needs immutable grouping columns"
        )
    changes = lake.table_changes(from_seq, to_seq=to_seq, images="both")
    return apply_rollup_deltas(
        prev, rollup_deltas(changes, group_cols, aggs), group_cols
    )
