"""As-of join semantics: inclusive backward/forward matching, left-outer
nulls, deterministic tie-breaks on duplicate right timestamps, tolerance
windows, and a cross-check against pandas ``merge_asof`` on a randomized
fixture (the public reference implementation of the semantics)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from nifi_nlp_processor_spark.operators.asof import asof_join


T0 = datetime(2024, 1, 1)


def _ts(sec):
    return T0 + timedelta(seconds=sec)


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "k string, ts timestamp, lv long")
    r = spark.createDataFrame(right_rows, "k string, ts timestamp, rid long, rv double")
    return l, r


def _collect(df):
    return {
        (r.k, r.ts): (r.ts_right, r.rv_right)
        for r in df.collect()
    }


def test_backward_inclusive_and_unmatched(spark):
    l, r = _frames(
        spark,
        [("a", _ts(10), 1), ("a", _ts(5), 2), ("a", _ts(1), 3)],
        [("a", _ts(5), 100, 0.5), ("a", _ts(8), 101, 0.8)],
    )
    got = _collect(asof_join(l, r, ["k"], "ts", ["rv"], tie_col="rid"))
    assert got[("a", _ts(10))] == (_ts(8), 0.8)
    # equal timestamp matches inclusively
    assert got[("a", _ts(5))] == (_ts(5), 0.5)
    # nothing at or before ts=1 → left-outer null
    assert got[("a", _ts(1))] == (None, None)


def test_forward_direction(spark):
    l, r = _frames(
        spark,
        [("a", _ts(10), 1), ("a", _ts(5), 2), ("a", _ts(9), 3)],
        [("a", _ts(5), 100, 0.5), ("a", _ts(8), 101, 0.8)],
    )
    got = _collect(
        asof_join(l, r, ["k"], "ts", ["rv"], direction="forward", tie_col="rid")
    )
    assert got[("a", _ts(5))] == (_ts(5), 0.5)  # inclusive
    assert got[("a", _ts(9))] == (None, None)   # nothing at/after 9... except? 8 < 9
    assert got[("a", _ts(10))] == (None, None)


def test_duplicate_right_ts_greatest_tie_wins_both_directions(spark):
    l, r = _frames(
        spark,
        [("a", _ts(6), 1), ("a", _ts(4), 2)],
        [("a", _ts(5), 100, 1.0), ("a", _ts(5), 102, 3.0), ("a", _ts(5), 101, 2.0)],
    )
    back = _collect(asof_join(l, r, ["k"], "ts", ["rv"], tie_col="rid"))
    assert back[("a", _ts(6))] == (_ts(5), 3.0)
    fwd = _collect(
        asof_join(l, r, ["k"], "ts", ["rv"], direction="forward", tie_col="rid")
    )
    assert fwd[("a", _ts(4))] == (_ts(5), 3.0)


def test_keys_never_cross(spark):
    l, r = _frames(
        spark,
        [("a", _ts(10), 1), ("b", _ts(10), 2)],
        [("a", _ts(3), 100, 0.3)],
    )
    got = _collect(asof_join(l, r, ["k"], "ts", ["rv"], tie_col="rid"))
    assert got[("a", _ts(10))] == (_ts(3), 0.3)
    assert got[("b", _ts(10))] == (None, None)


def test_tolerance_nulls_distant_matches(spark):
    l, r = _frames(
        spark,
        [("a", _ts(100), 1), ("a", _ts(4), 2)],
        [("a", _ts(3), 100, 0.3)],
    )
    got = _collect(
        asof_join(l, r, ["k"], "ts", ["rv"], tie_col="rid", tolerance_sec=10)
    )
    assert got[("a", _ts(4))] == (_ts(3), 0.3)      # 1s gap, within tolerance
    assert got[("a", _ts(100))] == (None, None)      # 97s gap, nulled


def test_plan_has_window_and_no_join(spark):
    """The operator's whole point at scale: one shuffle + window, never an
    inequality join (O(|L|·|R|) per key) — assert it structurally."""
    l, r = _frames(
        spark,
        [("a", _ts(10), 1)],
        [("a", _ts(5), 100, 0.5)],
    )
    plan = (
        asof_join(l, r, ["k"], "ts", ["rv"], tie_col="rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "Join" not in plan  # no SortMergeJoin/BroadcastNestedLoopJoin/...


def test_matches_pandas_merge_asof_randomized(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame(
        {
            "k": rng.choice(["u1", "u2", "u3"], n_l),
            "ts": [T0 + timedelta(seconds=int(s)) for s in rng.integers(0, 5000, n_l)],
            "lv": np.arange(n_l, dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.choice(["u1", "u2", "u3"], n_r),
            "ts": [T0 + timedelta(seconds=int(s)) for s in rng.integers(0, 5000, n_r)],
            "rid": np.arange(n_r, dtype="int64"),
            "rv": rng.random(n_r),
        }
    )
    # pandas merge_asof picks the LAST right row among equal timestamps in
    # input order; sort right by (ts, rid) so "last" == greatest rid — the
    # operator's documented tie rule.
    exp = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values(["ts", "rid"], kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    )
    got = (
        asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            ["k"],
            "ts",
            ["rv"],
            tie_col="rid",
        )
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    exp = exp.sort_values("lv").reset_index(drop=True)
    assert len(got) == n_l
    pd.testing.assert_series_equal(
        got["rv_right"], exp["rv"], check_names=False, check_exact=True
    )
