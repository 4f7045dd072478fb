"""Debezium-envelope source adapter: round-trip fidelity, delete-image
semantics, malformed-row degradation into the quarantine path, and
streaming compatibility."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.fixtures import ChangeStreamSpec, change_events
from nifi_nlp_processor_spark.operators.quarantine import split_valid
from nifi_nlp_processor_spark.sources.envelope import (
    parse_envelope,
    to_envelope_json,
)

COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_envelope_round_trip(spark):
    ev = change_events(spark, ChangeStreamSpec(n_conversations=30, n_epochs=2))
    # the wire format carries ms-precision timestamps; truncate the
    # expectation the same way
    want = ev.select(
        *[c for c in COLS if c != "ts"],
        F.timestamp_millis(F.unix_millis("ts")).alias("ts"),
    )
    got = parse_envelope(to_envelope_json(ev))
    assert got.columns == COLS
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_envelope_delete_image_from_before(spark):
    raw = spark.createDataFrame(
        [(
            '{"op":"d","before":{"conv_id":"c1","turn_idx":3,"role":"user",'
            '"text":"gone","tool":null},"source":{"lsn":77,"ts_ms":1000}}',
        )],
        "value string",
    )
    row = parse_envelope(raw).first()
    assert (row["op"], row["lsn"], row["conv_id"], row["turn_idx"], row["text"]) == (
        "D", 77, "c1", 3, "gone")


def test_envelope_snapshot_read_maps_to_insert(spark):
    raw = spark.createDataFrame(
        [(
            '{"op":"r","after":{"conv_id":"c2","turn_idx":0,"role":"user",'
            '"text":"snap","tool":null},"source":{"lsn":1,"ts_ms":0}}',
        )],
        "value string",
    )
    assert parse_envelope(raw).first()["op"] == "I"


def test_envelope_malformed_rows_flow_to_quarantine(spark):
    good = to_envelope_json(
        change_events(spark, ChangeStreamSpec(n_conversations=5, n_epochs=1))
    )
    bad = spark.createDataFrame(
        [("{not json",), ('{"op":"u"}',), ("",)], "value string"
    )
    parsed = parse_envelope(good.unionByName(bad))
    valid, dlq = split_valid(parsed)
    # the three malformed envelopes (no parsable key/lsn) land in the DLQ;
    # every well-formed one survives
    assert dlq.count() == 3
    assert valid.count() == good.count()


def test_envelope_parse_is_streaming_compatible(spark, tmp_path):
    ev = change_events(spark, ChangeStreamSpec(n_conversations=5, n_epochs=1))
    src = str(tmp_path / "envsrc")
    to_envelope_json(ev).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("value string").parquet(src)
    parsed = parse_envelope(stream)
    assert parsed.isStreaming
    out = str(tmp_path / "envout")
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == ev.count()
