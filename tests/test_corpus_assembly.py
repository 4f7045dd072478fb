"""Unit tests for the training-data assembly operators: benchmark
decontamination, token-budget sequence packing, deterministic
split/sampling. Registry-level oracle parity is covered by
test_queries_oracle.py; these tests pin the operator semantics and the
scale-flavor equivalences."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.decontaminate import decontaminate
from nifi_nlp_processor_spark.operators.packing import pack_sequences, pack_stats
from nifi_nlp_processor_spark.operators.sampling import (
    dataset_split,
    weighted_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

BENCH_PHRASE = "the quick brown fox jumps over the lazy dog"


def _contam_fixture(spark):
    corpus = _docs(spark, [
        # exact benchmark text → fully contaminated
        (1, BENCH_PHRASE, "en"),
        # benchmark phrase embedded in a longer doc → partial overlap
        (2, "intro words here " + BENCH_PHRASE + " trailing words", "en"),
        # clean doc, no shared 5-gram
        (3, "completely unrelated text about spark shuffle partitions yes", "en"),
        # shares a 4-gram but not a 5-gram → clean at n=5
        (4, "quick brown fox jumps into a different sentence entirely now", "en"),
    ])
    bench = _docs(spark, [(100, BENCH_PHRASE, "en")])
    return corpus, bench


def test_decontaminate_flags_planted_overlap(spark):
    corpus, bench = _contam_fixture(spark)
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=5).collect()}
    assert set(out) == {1, 2}
    # doc 1 IS the benchmark doc: every one of its 5-grams hits
    assert out[1]["n_hits"] == out[1]["n_ngrams"]
    assert out[1]["contaminated_frac"] == 1.0
    # doc 2 contains the phrase: all 5 of the phrase's 5-grams hit, but the
    # doc has more 5-grams than the phrase → strictly partial
    assert out[2]["n_hits"] == 5
    assert 0.0 < out[2]["contaminated_frac"] < 1.0


def test_decontaminate_hash_flavors_agree(spark):
    corpus, bench = _contam_fixture(spark)
    a = sorted(map(tuple, decontaminate(corpus, bench, n=5, hash_fn="xxhash64").collect()))
    b = sorted(map(tuple, decontaminate(corpus, bench, n=5, hash_fn="md5").collect()))
    assert a == b


def test_decontaminate_shuffle_path_matches_broadcast(spark):
    corpus, bench = _contam_fixture(spark)
    a = sorted(map(tuple, decontaminate(corpus, bench, n=5).collect()))
    b = sorted(map(tuple, decontaminate(
        corpus, bench, n=5, broadcast_benchmark=False).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def test_pack_sequences_concat_then_chunk(spark):
    # one lang, one shard (n_shards=1): docs of 4,4,4,4 tokens, budget 10
    # concatenated stream offsets: 0,4,8,12 → packs 0,0,0,1
    docs = _docs(spark, [
        (0, "a b c d", "en"),
        (1, "e f g h", "en"),
        (2, "i j k l", "en"),
        (3, "m n o p", "en"),
    ])
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, 10, n_shards=1).collect()}
    assert [out[i]["pack_offset"] for i in range(4)] == [0, 4, 8, 12]
    assert [out[i]["pack_id"] for i in range(4)] == [0, 0, 0, 1]


def test_pack_sequences_invariants_on_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(docs, 256, n_shards=4).cache()
    # pack_id is always derived from the offset
    bad = packed.where(
        F.col("pack_id") != F.floor(F.col("pack_offset") / 256)
    ).count()
    assert bad == 0
    # offsets are the exact running token total within each (lang, shard)
    from pyspark.sql import Window
    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    recomputed = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    mismatches = (
        packed.withColumn("expected_offset", recomputed)
        .where(F.col("pack_offset") != F.col("expected_offset"))
        .count()
    )
    assert mismatches == 0
    # every doc is packed exactly once
    assert packed.count() == docs.count()
    stats = pack_stats(packed, 256)
    # pack token sums reconcile with the corpus token total
    total = stats.agg(F.sum("pack_tokens")).first()[0]
    corpus_total = docs.select(
        F.sum(F.size(F.split("text", " ")))).first()[0]
    assert total == corpus_total
    packed.unpersist()


# ---------------------------------------------------------------------------
# dataset_split / weighted_sample
# ---------------------------------------------------------------------------

def test_dataset_split_deterministic_and_total(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dataset_split(docs).groupBy("split").count().collect()
    b = dataset_split(docs).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["count"] for r in a) == docs.count()
    assert {r["split"] for r in a} <= {"train", "val", "test"}


def test_dataset_split_stable_under_growing_later_fractions(spark):
    # enlarging a LATER split never moves docs out of an earlier one
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = dataset_split(docs, fractions={"train": 0.5, "val": 0.1, "test": 0.4})
    big = dataset_split(docs, fractions={"train": 0.5, "val": 0.3, "test": 0.2})
    tr_small = {r["doc_id"] for r in small.where("split = 'train'").collect()}
    tr_big = {r["doc_id"] for r in big.where("split = 'train'").collect()}
    assert tr_small == tr_big
    val_small = {r["doc_id"] for r in small.where("split = 'val'").collect()}
    val_big = {r["doc_id"] for r in big.where("split = 'val'").collect()}
    assert val_small <= val_big


def test_dataset_split_rejects_overfull_fractions(spark):
    docs = spark.range(1).select(F.col("id").alias("doc_id"))
    import pytest
    with pytest.raises(ValueError):
        dataset_split(docs, fractions={"a": 0.8, "b": 0.3})


def test_weighted_sample_extremes_and_subset(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = weighted_sample(docs, {"en": 1.0, "de": 0.0}, default=0.5)
    by_lang = {r["lang"]: r["count"]
               for r in kept.groupBy("lang").count().collect()}
    n_en = docs.where("lang = 'en'").count()
    assert by_lang.get("en") == n_en          # p=1 keeps all
    assert "de" not in by_lang                # p=0 keeps none
    # default-p languages land strictly between the extremes
    n_fr = docs.where("lang = 'fr'").count()
    assert 0 < by_lang.get("fr", 0) < n_fr
    # deterministic: a second run keeps the identical doc set
    again = weighted_sample(docs, {"en": 1.0, "de": 0.0}, default=0.5)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_weighted_sample_rejects_bad_probability(spark):
    docs = spark.range(1).select(F.col("id").alias("doc_id"),
                                 F.lit("en").alias("lang"))
    import pytest
    with pytest.raises(ValueError):
        weighted_sample(docs, {"en": 1.5})
