"""Debezium-style CDC envelope source adapter.

Real binlog/WAL tails arrive as JSON envelopes on a message bus —
``{"op": "c|u|d|r", "before": {...}, "after": {...}, "source": {"lsn": N,
"ts_ms": M}}`` (the Debezium change-event contract, which MySQL binlog,
Postgres WAL and most CDC relays emit). This module is the boundary
between that wire format and the engine's typed change-event schema
``(lsn, op, conv_id, turn_idx, role, text, tool, ts)``:

* parsing is one ``from_json`` against an explicit schema — JVM-side,
  whole-stage codegen, no Python; at 100 TB the parse pipelines into the
  Kafka/file scan with zero extra stages;
* op-code mapping: ``c``/``r`` (create / snapshot read) → ``I``, ``u`` →
  ``U``, ``d`` → ``D`` — the delete image is taken from ``before`` (a
  Debezium delete has ``after = null``), everything else from ``after``;
* **malformed envelopes degrade, never crash**: ``from_json`` yields NULL
  for unparseable rows, the key columns come out NULL, and the engine's
  ``split_valid`` routes them to the dead-letter quarantine — the same
  failure-sink path every other source uses (REL_FAILURE analogue,
  reference: PontusNLPProcessor.java error routing).

The adapter works identically on a batch DataFrame and a streaming one
(``readStream`` from Kafka/files) — it is a pure column transformation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload image carried in before/after: the input-hint transcript row
PAYLOAD_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
])


def envelope_schema(payload: T.StructType = PAYLOAD_SCHEMA) -> T.StructType:
    """The Debezium envelope as an explicit Spark schema (never inferred —
    schema inference on a 100 TB stream is a full extra pass)."""
    return T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("before", payload),
        T.StructField("after", payload),
        T.StructField("source", T.StructType([
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            # Debezium's source.table — the routing key for multi-table
            # streams (runner.MultiTableEngine); null for single-table relays
            T.StructField("table", T.StringType()),
        ])),
    ])


def parse_envelope(
    raw: DataFrame,
    value_col: str = "value",
    payload: T.StructType = PAYLOAD_SCHEMA,
    with_table: bool = False,
) -> DataFrame:
    """JSON envelope column → typed change-event rows.

    Returns the engine schema ``(lsn, op, conv_id, turn_idx, role, text,
    tool, ts)``. Unparseable rows come out with NULL keys and flow to the
    engine's quarantine — callers do not pre-filter. ``with_table=True``
    appends the envelope's ``source.table`` as a ``table`` column — the
    routing key for ``MultiTableEngine`` fan-out.
    """
    p = F.from_json(F.col(value_col), envelope_schema(payload))
    img: Column = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    op = (
        F.when(p["op"].isin("c", "r"), F.lit("I"))
        .when(p["op"] == "u", F.lit("U"))
        .when(p["op"] == "d", F.lit("D"))
    )
    cols = [
        p["source"]["lsn"].alias("lsn"),
        op.alias("op"),
    ]
    cols += [img[f.name].alias(f.name) for f in payload.fields]
    cols.append(F.timestamp_millis(p["source"]["ts_ms"]).alias("ts"))
    if with_table:
        cols.append(p["source"]["table"].alias("table"))
    return raw.select(*cols)


def to_envelope_json(
    changes: DataFrame,
    payload_cols: tuple[str, ...] = ("conv_id", "turn_idx", "role", "text", "tool"),
    table_col: str | None = None,
) -> DataFrame:
    """Inverse adapter (and the deterministic test fixture): typed change
    rows → one JSON envelope string per row in the ``value`` column.

    Deletes carry the image in ``before`` with ``after`` omitted, matching
    the wire contract ``parse_envelope`` consumes; ``to_json`` omits null
    fields, so the envelopes look exactly like a relay's output.
    """
    image = F.struct(*[F.col(c) for c in payload_cols])
    # parquet sources may carry TIMESTAMP_NTZ; unix_millis needs TIMESTAMP —
    # the session-tz reinterpretation is inverted bit-for-bit by
    # timestamp_millis on the parse side
    ts = F.col("ts")
    if isinstance(changes.schema["ts"].dataType, T.TimestampNTZType):
        ts = ts.cast("timestamp")
    env = F.struct(
        F.when(F.col("op") == "D", F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.when(F.col("op") == "D", image).alias("before"),
        F.when(F.col("op") != "D", image).alias("after"),
        F.struct(
            F.col("lsn"),
            F.unix_millis(ts).alias("ts_ms"),
            *([F.col(table_col).alias("table")] if table_col else []),
        ).alias("source"),
    )
    return changes.select(F.to_json(env).alias("value"))
