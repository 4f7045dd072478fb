"""Schema-evolution epochs (SURVEY §4.2 #3, FIXTURES.md F3): added column,
int→bigint widening, old files readable through the evolved schema.
Regression coverage for the simpleString() widening-name bug found in
round-1 verification."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nifi_nlp_processor_spark.fixtures import ChangeStreamSpec, change_events
from nifi_nlp_processor_spark.lake import ParquetLakeTable, evolve_schema, widen
from nifi_nlp_processor_spark.runner import CdcEngine
from pyspark.sql import types as T


def test_widen_matrix():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.IntegerType()) == T.LongType()
    assert widen(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.StringType(), T.StringType()) == T.StringType()
    with pytest.raises(ValueError):
        widen(T.StringType(), T.IntegerType())


def test_evolve_schema_add_and_widen():
    cur = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    inc = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())]
    )
    out, changed = evolve_schema(cur, inc)
    assert changed
    assert [(f.name, f.dataType.simpleString()) for f in out.fields] == [
        ("a", "bigint"),
        ("b", "string"),
        ("c", "double"),
    ]
    # no-op evolution reports unchanged
    out2, changed2 = evolve_schema(out, out)
    assert not changed2


def test_evolution_epoch_end_to_end(spark, tmp_path):
    spec = ChangeStreamSpec(n_conversations=15, n_epochs=2, out_of_order=False,
                            dup_frac=0.0)
    events = change_events(spark, spec).cache()
    lake = ParquetLakeTable(spark, str(tmp_path / "evo"), n_buckets=4)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(events)
    v1 = lake.current_schema()
    assert "model" not in [f.name for f in v1.fields]
    n_before = lake.read().count()

    # cutover epoch: new column + widened turn_idx, higher lsns
    max_lsn = events.agg(F.max("lsn")).collect()[0][0]
    ev2 = (
        events.where(F.col("epoch_id") == 1)
        .withColumn("lsn", F.col("lsn") + max_lsn + 1)
        .withColumn("model", F.lit("gpt-x"))
        .withColumn("turn_idx", F.col("turn_idx").cast("long"))
        .withColumn("text", F.concat(F.lit("v9 "), F.col("text")))
    )
    engine.apply_epoch(ev2, 100)
    sch = {f.name: f.dataType.simpleString() for f in lake.current_schema().fields}
    assert sch["model"] == "string"
    assert sch["turn_idx"] == "bigint"

    cur = lake.read()
    assert cur.count() == n_before  # same keys, updated in place
    # new-epoch rows carry the column; pre-evolution rows read as NULL
    assert cur.where(F.col("model") == "gpt-x").count() > 0
    assert cur.where(F.col("model").isNull()).count() > 0
    # widened values survive and updated text won LWW: every key whose
    # winning ev2 event is not a delete now shows the v9 text
    from nifi_nlp_processor_spark.operators.cdc_lww import lww_dedupe

    expect = lww_dedupe(ev2).where(F.col("op") != "D").count()
    assert cur.where(F.col("text").startswith("v9 ")).count() == expect


def test_file_schema_matches_written_footers(spark, tmp_path):
    """The explicit schema handed to manifest-driven reads (stored fields
    + LWW meta columns) must equal what the writer actually put in the
    files — the contract that lets the merge/fold/snapshot paths skip
    footer inference. Also pins the per-handle cache (schema files are
    immutable) and that a fresh handle on the same root agrees."""
    import os

    import pyarrow.parquet as pq

    from nifi_nlp_processor_spark.lake import META_DELETED, META_LSN

    spec = ChangeStreamSpec(n_conversations=8, n_epochs=2, out_of_order=False)
    events = change_events(spark, spec)
    lake = ParquetLakeTable(spark, str(tmp_path / "fs"), n_buckets=2)
    CdcEngine(lake=lake).apply_epochs(events)

    sname = lake.last_commit()["schema"]
    fs = lake._file_schema(sname)
    assert [f.name for f in fs.fields][-2:] == [META_LSN, META_DELETED]

    # one real data file's footer agrees column-for-column (name and
    # spark type) with the schema we claim for it
    ptr = next(iter(lake.last_commit()["buckets"].values()))
    bdir = os.path.join(lake.root, ptr["path"])
    pf = next(f for f in os.listdir(bdir) if f.endswith(".parquet"))
    footer = spark.read.parquet(os.path.join(bdir, pf)).schema
    assert [(f.name, f.dataType) for f in footer.fields] == [
        (f.name, f.dataType) for f in fs.fields
    ]

    # immutable schema files → cached per handle; a new handle re-parses
    # to an equal schema
    assert lake._stored_schema(sname) is lake._stored_schema(sname)
    lake2 = ParquetLakeTable(spark, lake.root)
    assert lake2._file_schema(sname) == fs

    # the manifest's per-part row counts (salt sizing input) agree with
    # the footers they were read from
    n_footer = sum(
        pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows
        for f in os.listdir(bdir)
        if f.endswith(".parquet")
    )
    assert ptr["rows"] == n_footer


def test_incompatible_change_rejected(spark, tmp_path):
    spec = ChangeStreamSpec(n_conversations=5, n_epochs=1)
    events = change_events(spark, spec)
    lake = ParquetLakeTable(spark, str(tmp_path / "bad"), n_buckets=2)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(events)
    n_commits = len(lake.commit_history())
    bad = events.withColumn("role", F.lit(1).cast("int"))
    with pytest.raises(ValueError, match="unsupported schema change"):
        engine.apply_epoch(bad, 50)
    # failed epoch left no commit behind (snapshot isolation)
    assert len(lake.commit_history()) == n_commits
