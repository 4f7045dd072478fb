"""Regression tests for the round-2 fixes (VERDICT.md "What's wrong" /
ADVICE.md findings)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.functions.dictionary import membership
from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.operators.cdc_lww import lww_dedupe, salted_lww_dedupe
from nifi_nlp_processor_spark.runner import CdcEngine


def test_all_null_lsn_bucket_does_not_crash_merge(spark):
    """ADVICE high: an epoch where every event of some bucket has a null
    lsn (quarantinable) must not crash the merge with int(None) — the probe
    now runs on the post-quarantine frame."""
    rows = [
        ("c1", 1, "user", "hello", None, F_ts(0), 10, "I"),
        # every event for conv "dead" has lsn=None → quarantined; with the
        # old pre-quarantine probe its bucket produced a None watermark
        ("dead", 1, "user", "x", None, F_ts(1), None, "I"),
        ("dead", 2, "user", "y", None, F_ts(2), None, "U"),
    ]
    batch = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string,"
        " ts timestamp, lsn long, op string",
    )
    root = tempfile.mkdtemp(prefix="nulllsn_")
    engine = CdcEngine(lake=ParquetLakeTable(spark, root, n_buckets=4))
    res = engine.apply_epoch(batch, epoch_id=0)
    assert res.merge.rows_applied == 1
    got = engine.lake.read().select("conv_id", "turn_idx").collect()
    assert [(r.conv_id, r.turn_idx) for r in got] == [("c1", 1)]
    # the quarantined rows' buckets are NOT touched and raise no watermark
    wm = engine.lake.last_commit()["watermarks"]
    assert all(v == 10 for v in wm.values()) and len(wm) == 1


def F_ts(i: int):
    import datetime

    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i)


def test_key_only_schema_lww(spark):
    """ADVICE medium: a frame with only key columns + lsn used to raise
    WRONG_NUM_ARGS from xxhash64() with an empty column list."""
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 1, 9), ("b", 2, 3)],
        "conv_id string, turn_idx int, lsn long",
    )
    got = {
        (r.conv_id, r.turn_idx): r.lsn
        for r in lww_dedupe(df, ["conv_id", "turn_idx"]).collect()
    }
    assert got == {("a", 1): 9, ("b", 2): 3}
    got_salted = {
        (r.conv_id, r.turn_idx): r.lsn
        for r in salted_lww_dedupe(df, ["conv_id", "turn_idx"], salt_k=4).collect()
    }
    assert got_salted == got


def test_key_only_schema_merge(spark):
    """lake.py analogue: merging a source whose schema is exactly the key
    columns (+ lsn/op) must not raise from the zero-arg content hash."""
    df = spark.createDataFrame(
        [("a", 1, 5, "I"), ("a", 1, 9, "U"), ("b", 2, 3, "I")],
        "conv_id string, turn_idx int, lsn long, op string",
    )
    root = tempfile.mkdtemp(prefix="keyonly_")
    lake = ParquetLakeTable(spark, root, n_buckets=4)
    lake.merge_into(df, epoch_id=0)
    got = {(r.conv_id, r.turn_idx) for r in lake.read().collect()}
    assert got == {("a", 1), ("b", 2)}


def test_fuzzy_membership_preserves_duplicate_rows(spark):
    """VERDICT wrong#2: the fuzzy path re-joined hits on all candidate
    columns, multiplying duplicated candidate rows (3 in → 4 out)."""
    cand = spark.createDataFrame(
        [("smith",), ("smith",), ("zzz",)], "value string"
    )
    dic = spark.createDataFrame([("smyth",), ("jones",)], "value string")
    out = membership(cand, dic, mode="exact", fuzzy=True, max_edits=2)
    rows = out.collect()
    assert len(rows) == 3
    got = sorted((r.value, r.matched) for r in rows)
    assert got == [("smith", True), ("smith", True), ("zzz", False)]
    assert out.columns == ["value", "matched"]
