"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken — the MOSS
fingerprinter): partial-overlap detection that whole-doc sketches dilute
away. Pins the coverage theorem (any shared substring ≥ k + window - 1
yields ≥ 1 shared fingerprint), the empty-sketch edge, the
stop-fingerprint DF cap with Observation-logged drops, and md5_32 vs
xxhash64 flavor agreement on detection."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.doc_dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 8, 4
MIN_SHARED_SUBSTR = K + W - 1  # 11


def _docs(spark, pairs):
    return spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in pairs], "doc_id long, text string"
    )


def _sketches(spark, pairs, hash_fn="md5_32"):
    rows = winnow_fingerprints(
        _docs(spark, pairs), k=K, window=W, hash_fn=hash_fn
    ).collect()
    return {r.doc_id: set(r.fingerprints) for r in rows}


def test_coverage_theorem_shared_passage(spark):
    # a copied 30-char passage inside otherwise-disjoint documents (the
    # surrounding text uses disjoint alphabets so ONLY the passage is
    # common) must yield at least one shared fingerprint
    passage = "the quick brown fox jumps over"
    sk = _sketches(spark, [
        (1, "aaaaabbbbbcccccdddd " + passage + " eeeeefffffggggg"),
        (2, "zzzzzyyyyyxxxxxwwww " + passage + " vvvvvuuuuuttttt"),
    ])
    assert sk[1] & sk[2]


def test_coverage_theorem_minimum_length(spark):
    # exactly k + window - 1 = 11 shared chars is the guarantee boundary
    shared = "0123456789#"  # 11 chars, disjoint from the filler alphabets
    sk = _sketches(spark, [
        (1, "aaaaaaaaaaaaaaaaaaaa" + shared + "bbbbbbbbbbbbbbbbbbbb"),
        (2, "cccccccccccccccccccc" + shared + "dddddddddddddddddddd"),
    ])
    assert sk[1] & sk[2]


def test_disjoint_alphabets_share_nothing(spark):
    sk = _sketches(spark, [
        (1, "abcdefgh " * 10),
        (2, "zyxwvuts " * 10),
    ])
    assert not (sk[1] & sk[2])


def test_short_doc_sketches_empty(spark):
    sk = _sketches(spark, [
        (1, "0123456789"),        # 10 chars < 11: no complete window
        (2, "0123456789a"),       # 11 chars: exactly one window
        (3, None),                # null text
    ])
    assert sk[1] == set() and sk[3] == set()
    assert len(sk[2]) == 1


def test_sketch_position_independent(spark):
    # winnowing selects window minima of content hashes, so the same
    # passage sketches identically wherever it sits in the document
    passage = "the quick brown fox jumps over the lazy dog again"
    sk = _sketches(spark, [(1, passage), (2, "zzzz qqqq " + passage)])
    assert sk[1] <= sk[2]


def test_overlap_pairs_and_df_cap(spark):
    boiler = "standard license header appears everywhere verbatim"
    docs = [(i, f"unique body {i} " * 3 + boiler) for i in range(10)]
    docs += [(100, "one of a kind passage only here and there padding"),
             (101, "totally different one of a kind passage only here zzz")]
    sk = winnow_fingerprints(_docs(spark, docs), k=K, window=W)
    # uncapped: the boilerplate ties all 10 docs pairwise
    uncapped = winnow_overlap_pairs(sk, min_shared=1)
    assert uncapped.where("a_id < 10 AND b_id < 10").count() == 45
    # capped at df<=2 the boilerplate drops (Observation-logged), while the
    # df=2 passage shared by exactly the planted pair survives
    obs = Observation("winnow-cap")
    capped = winnow_overlap_pairs(
        sk, min_shared=1, max_doc_freq=2, df_observation=obs
    ).collect()
    got = {(r.a_id, r.b_id) for r in capped}
    assert (100, 101) in got
    assert not any(a < 10 and b < 10 for a, b in got)
    assert obs.get["dropped_fingerprints"] > 0


def test_flavors_agree_on_detection(spark):
    passage = "copied analytical paragraph with enough length to winnow"
    docs = [
        (1, "alpha beta gamma " + passage),
        (2, passage + " delta epsilon zeta"),
        (3, "entirely unrelated content qqq www rrr ttt yyy uuu"),
    ]
    pairs = {}
    for flavor in ("md5_32", "xxhash64"):
        sk = winnow_fingerprints(_docs(spark, docs), k=K, window=W, hash_fn=flavor)
        got = winnow_overlap_pairs(sk, min_shared=2).collect()
        pairs[flavor] = {(r.a_id, r.b_id) for r in got}
    assert pairs["md5_32"] == pairs["xxhash64"] == {(1, 2)}


def test_no_python_stage_in_sketch_plan(spark):
    # the sketch is pure codegen: no Python eval, no explode below it
    df = winnow_fingerprints(_docs(spark, [(1, "abc " * 40)]), k=K, window=W)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
    assert "Generate" not in plan  # no explode in the sketch itself
