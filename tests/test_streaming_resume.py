"""M3: streaming delivery, checkpoint resume, and mid-replay restart.

The engine's exactly-once story has two layers: Spark's streaming
checkpoint (at-least-once batch re-delivery) and the lake's epoch ledger
(idempotent re-apply). These tests exercise both — including the case the
checkpoint alone cannot solve: a crash after the lake commit but before the
checkpoint commit re-delivers a batch the lake has already applied.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from nifi_nlp_processor_spark.fixtures import ChangeStreamSpec, change_events
from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.oracle import final_rows
from nifi_nlp_processor_spark.runner import CdcEngine, stream_apply

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

SPEC = ChangeStreamSpec(
    n_conversations=25, update_frac=0.3, update2_frac=0.1, delete_frac=0.2,
    dup_frac=0.1, out_of_order=True, n_epochs=4,
)


def _oracle(events_df):
    return final_rows([r.asDict() for r in events_df.collect()], COLS)


def _lake_rows(lake):
    return sorted(tuple(r) for r in lake.read().select(*COLS).collect())


def _write_epochs(events, src_dir, epochs):
    """One parquet file-group per epoch → one streaming micro-batch each
    (maxFilesPerTrigger handles the batching)."""
    for e in epochs:
        (
            events.where(F.col("epoch_id") == e)
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )


def test_stream_apply_end_to_end(spark, tmp_path):
    """File-source streaming (readStream → foreachBatch(apply_epoch)) lands
    the same final state as the sequential oracle."""
    events = change_events(spark, SPEC).cache()
    src = str(tmp_path / "src")
    _write_epochs(events, src, range(SPEC.n_epochs))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    engine = CdcEngine(lake=lake)
    q = stream_apply(engine, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert _lake_rows(lake) == _oracle(events)
    events.unpersist()


def test_stream_checkpoint_resume(spark, tmp_path):
    """Stop after the first half of the stream, deliver the rest, restart
    from the checkpoint: already-processed files are not re-read, new ones
    are, and the final state equals the full oracle."""
    events = change_events(spark, SPEC).cache()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=8)

    _write_epochs(events, src, [0, 1])
    engine = CdcEngine(lake=lake)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_apply(engine, stream, ckpt)
    q.awaitTermination(120)
    n_commits_half = len(lake.commit_history())
    assert n_commits_half >= 1

    # late delivery while the query is down, then resume from checkpoint
    _write_epochs(events, src, [2, 3])
    engine2 = CdcEngine(lake=lake)
    stream2 = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = stream_apply(engine2, stream2, ckpt)
    q2.awaitTermination(120)

    # resumed query processed only the new files (batch ids continue)
    applied2 = [r for r in engine2.results if not r.merge.skipped]
    assert 1 <= len(applied2) <= 2
    assert _lake_rows(lake) == _oracle(events)
    events.unpersist()


def test_batch_restart_mid_replay(spark, tmp_path):
    """Crash-and-restart in batch mode: a fresh engine over the same lake
    root skips committed epochs via the ledger (even with no Spark
    checkpoint) and completes the replay to the oracle state."""
    events = change_events(spark, SPEC).cache()
    root = str(tmp_path / "lake")

    first = CdcEngine(lake=ParquetLakeTable(spark, root, n_buckets=8))
    for e in (0, 1):
        first.apply_epoch(events.where(F.col("epoch_id") == e), e)

    # "restart": brand-new engine object, same lake root, full replay
    second = CdcEngine(lake=ParquetLakeTable(spark, root, n_buckets=8))
    results = second.apply_epochs(events)
    skipped = [r.epoch_id for r in results if r.merge.skipped]
    assert skipped == [0, 1]
    assert _lake_rows(second.lake) == _oracle(events)
    events.unpersist()


def test_managed_stream_stops_on_exit(spark, tmp_path):
    """L3 teardown: the context manager stops the query on scope exit —
    including when the body raises — and the applied state is still the
    oracle state for whatever completed."""
    from nifi_nlp_processor_spark.runner import managed_stream

    events = change_events(spark, SPEC).cache()
    src = str(tmp_path / "src")
    _write_epochs(events, src, range(SPEC.n_epochs))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    engine = CdcEngine(lake=lake)
    with managed_stream(engine, stream, str(tmp_path / "ckpt")) as q:
        q.awaitTermination(120)
    assert not q.isActive
    assert _lake_rows(lake) == _oracle(events)

    # error path: query must not survive the raising scope
    stream2 = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    lake2 = ParquetLakeTable(spark, str(tmp_path / "lake2"), n_buckets=8)
    with pytest.raises(RuntimeError, match="boom"):
        with managed_stream(CdcEngine(lake=lake2), stream2, str(tmp_path / "ckpt2")) as q2:
            raise RuntimeError("boom")
    assert not q2.isActive
    events.unpersist()


def test_stream_resume_with_schema_evolution(spark, tmp_path):
    """Schema evolution across a streaming restart: the stream runs with
    schema A, stops; late files arrive carrying an added column; the query
    resumes from the SAME checkpoint with the widened schema (file-source
    checkpoints track file progress, not schema). The lake evolves — old
    rows read NULL for the new column, new rows carry values."""
    events = change_events(spark, SPEC).cache()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=8)

    _write_epochs(events, src, [0, 1])
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_apply(CdcEngine(lake=lake), stream, ckpt)
    q.awaitTermination(120)
    assert "sentiment" not in [f.name for f in lake.current_schema().fields]

    # late epochs gain a sentiment column (schema B ⊃ schema A)
    late = events.where(F.col("epoch_id").isin([2, 3])).withColumn(
        "sentiment", F.when(F.col("lsn") % 2 == 0, "pos").otherwise("neg")
    )
    late.coalesce(1).write.mode("append").parquet(src)

    stream2 = (
        spark.readStream.schema(late.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = stream_apply(CdcEngine(lake=lake), stream2, ckpt)
    q2.awaitTermination(120)

    assert "sentiment" in [f.name for f in lake.current_schema().fields]
    rows = lake.read().collect()
    assert _lake_rows(lake) == _oracle(events)  # state unaffected by the add
    with_s = [r for r in rows if r.sentiment is not None]
    without_s = [r for r in rows if r.sentiment is None]
    # both populations exist: late-epoch winners carry values, keys last
    # written in early epochs read NULL
    assert with_s and without_s
    events.unpersist()
