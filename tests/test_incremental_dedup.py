"""Incremental near-dup dedup: batch-split invariance (1-, 2- and 5-batch
chunkings of the same stream keep exactly the same docs), the history
probe (a dup of a batch-1 doc arriving in batch 3 is dropped), restart
adoption of the persisted index, and the monotone-id guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.doc_dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from nifi_nlp_processor_spark.operators.incremental_dedup import NearDupIndex


def _corpus(spark):
    """60 docs with planted near-dups spread across the id range: doc 3i
    gets a near-copy at id 3i+1 ('tail' appended). Texts are 12 distinct
    words so 3-shingle jaccard of a planted pair is high."""
    rows = []
    for i in range(20):
        base = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((3 * i, base))
        rows.append((3 * i + 1, base + " tail"))
        rows.append((3 * i + 2, " ".join(f"u{i}y{j}" for j in range(12))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full_batch_kept(spark, docs):
    """The oracle rule: drop b iff exists a < b with verified jaccard >= t."""
    sh = shingles(docs, k=3)
    sig = minhash_signatures(sh, num_hashes=8)
    cand = lsh_candidate_pairs(sig, bands=4)
    pairs = jaccard_pairs(sh, min_jaccard=0.5, candidates=cand)
    dropped = {r.b_id for r in pairs.select("b_id").distinct().collect()}
    return {r.doc_id for r in docs.collect()} - dropped


def _run_split(spark, docs, bounds, root):
    idx = NearDupIndex(spark, root, min_jaccard=0.5, num_hashes=8, bands=4)
    kept = set()
    lo = None
    for hi in bounds:
        batch = docs.where(
            (F.col("doc_id") < hi) & ((F.col("doc_id") >= lo) if lo is not None else F.lit(True))
        )
        kept |= {r.doc_id for r in idx.process_batch(batch).collect()}
        lo = hi
    return kept


def test_batch_split_invariance(spark, tmp_path):
    docs = _corpus(spark)
    expected = _full_batch_kept(spark, docs)
    # planted pairs must make the check non-vacuous
    assert len(expected) < 60 and len(expected) >= 40

    one = _run_split(spark, docs, [1000], str(tmp_path / "i1"))
    two = _run_split(spark, docs, [30, 1000], str(tmp_path / "i2"))
    five = _run_split(spark, docs, [12, 24, 36, 48, 1000], str(tmp_path / "i5"))
    assert one == expected
    assert two == expected
    assert five == expected


def test_history_probe_catches_cross_batch_dup(spark, tmp_path):
    base = " ".join(f"q{j}" for j in range(15))
    b1 = spark.createDataFrame([(1, base), (2, "totally different words here now ok")],
                               "doc_id long, text string")
    b2 = spark.createDataFrame([(10, " ".join(f"z{j}" for j in range(15)))],
                               "doc_id long, text string")
    b3 = spark.createDataFrame([(20, base + " tail")], "doc_id long, text string")
    idx = NearDupIndex(spark, str(tmp_path / "idx"), min_jaccard=0.5)
    assert {r.doc_id for r in idx.process_batch(b1).collect()} == {1, 2}
    assert {r.doc_id for r in idx.process_batch(b2).collect()} == {10}
    # doc 20 is a near-dup of doc 1 from two batches ago → dropped
    assert idx.process_batch(b3).count() == 0


def test_restart_adopts_persisted_index(spark, tmp_path):
    base = " ".join(f"r{j}" for j in range(15))
    root = str(tmp_path / "idx")
    idx = NearDupIndex(spark, root, min_jaccard=0.5)
    idx.process_batch(
        spark.createDataFrame([(1, base)], "doc_id long, text string")
    )

    # NEW object on the same root: params + batches + high-water mark come
    # from _index.json, and the history probe still sees batch 1
    idx2 = NearDupIndex(spark, root)
    assert idx2.params["min_jaccard"] == 0.5
    assert idx2.max_id == 1
    out = idx2.process_batch(
        spark.createDataFrame([(5, base + " tail")], "doc_id long, text string")
    )
    assert out.count() == 0


def test_monotone_id_guard(spark, tmp_path):
    idx = NearDupIndex(spark, str(tmp_path / "idx"))
    idx.process_batch(
        spark.createDataFrame([(10, "a b c d e f")], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="ascending id ranges"):
        idx.process_batch(
            spark.createDataFrame([(5, "g h i j k l")], "doc_id long, text string")
        )
