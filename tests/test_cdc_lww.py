"""LWW dedupe variants agree (SURVEY §2.5, §4.2 #1) and the skew test
(SURVEY §5.2 #4): a mega-conversation with ≥20% of events produces
identical state through the salted path."""

from __future__ import annotations

import pyspark.sql.functions as F

from nifi_nlp_processor_spark.fixtures import ChangeStreamSpec, change_events
from nifi_nlp_processor_spark.operators.cdc_lww import (
    lww_dedupe,
    lww_dedupe_window,
    salted_lww_dedupe,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_variants_agree(spark):
    spec = ChangeStreamSpec(n_conversations=40, update_frac=0.5, update2_frac=0.3,
                            delete_frac=0.2, dup_frac=0.2)
    events = change_events(spark, spec).cache()
    a = _rows(lww_dedupe(events))
    b = _rows(lww_dedupe_window(events))
    c = _rows(salted_lww_dedupe(events, salt_k=8))
    assert a == b == c
    # exactly one row per key, and it carries the max lsn
    keys = events.select("conv_id", "turn_idx").distinct().count()
    assert len(a) == keys
    mx = {
        (r["conv_id"], r["turn_idx"]): r["mx"]
        for r in events.groupBy("conv_id", "turn_idx").agg(F.max("lsn").alias("mx")).collect()
    }
    got = {(t[3], t[4]): t[0] for t in a}  # lsn, op, epoch_id, conv_id, turn_idx...
    assert got == mx
    events.unpersist()


def test_skewed_key_profile(spark):
    """The mega-conversation really is skewed (fixture sanity) and the
    dedupe still returns exactly one winner per key."""
    spec = ChangeStreamSpec(n_conversations=30, mega_frac=0.3, dup_frac=0.3,
                            update_frac=0.5)
    events = change_events(spark, spec).cache()
    per_conv = events.groupBy("conv_id").count().collect()
    total = sum(r["count"] for r in per_conv)
    mega = max(r["count"] for r in per_conv)
    assert mega / total >= 0.2
    out = lww_dedupe(events)
    assert out.count() == events.select("conv_id", "turn_idx").distinct().count()
    assert _rows(out) == _rows(salted_lww_dedupe(events, salt_k=16))
    events.unpersist()


def test_partial_aggregation_in_plan(spark):
    """The scale guarantee: the agg-based LWW plans as a two-stage
    (partial+final) aggregate — map-side combine absorbs hot-key duplicates
    before the shuffle — and never as a per-key window sort.

    Note: max(struct(...)) currently lowers to SortAggregate (struct is not
    a mutable-buffer type), which still has a partial mode; if Spark ever
    plans it as HashAggregate this assertion still holds."""
    df = spark.range(1000).selectExpr(
        "cast(id % 37 as string) as conv_id",
        "cast(id % 11 as int) as turn_idx",
        "id as lsn",
        "'I' as op",
        "concat('t', id) as text",
    )
    plan = lww_dedupe(df)._jdf.queryExecution().executedPlan().toString()
    n_aggs = plan.count("SortAggregate") + plan.count("HashAggregate")
    assert n_aggs >= 2, plan  # partial + final
    assert "Window" not in plan, plan
