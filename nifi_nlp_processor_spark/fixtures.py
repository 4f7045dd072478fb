"""Deterministic synthetic transcript + change-event fixtures (SURVEY §7 M0).

Everything is generated with seeded hash expressions (``xxhash64``) over
``spark.range`` — no Python RNG in the data path, so the same (seed, knobs)
always produce bit-identical data on any cluster size. Shapes follow
FIXTURES.md: F1 ``transcripts`` (the input-hint schema: conv_id, turn_idx,
role, text, tool, ts) and F2 ``change_events`` (binlog/WAL envelope: lsn,
op, epoch_id + F1).

Skew: conversation 0 is a mega-conversation holding ``mega_frac`` of all
turns (the reference analogue is a hot dictionary domain; for us it is the
skewed-key case the north rule's salting requirement targets).

Texts embed deterministic emails / URLs / phones / handles / postcodes so
extractor-parity tests (reference regex registry,
nifi-nlp-processors/src/main/java/com/pontusvision/nifi/nlp/PontusNLPProcessor.java:97-105)
have known targets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_TS = "2025-01-01 00:00:00"

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["search", "calculator", "code_exec", "retrieval", "browser"]
_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _u(col: Column, salt: int, seed: int) -> Column:
    """Deterministic uniform in [0,1) derived from a column + salt."""
    return F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0


def _pick(arr: list[str], col: Column, salt: int, seed: int) -> Column:
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]),
        (F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(len(arr))) + 1).cast("int"),
    )


def _text_expr(uid: Column, version: Column, seed: int) -> Column:
    """Deterministic turn text: seeded prose + conditionally embedded entities.

    Mirrors the role of the reference's test corpus (large.txt / tweets,
    PontusNLPProcessorTest.java:92-178): free text with extractable spans.
    """
    key = uid * 7 + version.cast("long")
    w1 = _pick(_VOCAB, key, 11, seed)
    w2 = _pick(_VOCAB, key, 12, seed)
    w3 = _pick(_VOCAB, key, 13, seed)
    h = lambda s: F.pmod(F.xxhash64(key, F.lit(s), F.lit(seed)), F.lit(10))  # noqa: E731
    email = F.when(
        h(21) < 3,
        F.format_string(
            " contact user%d@example%d.com",
            F.pmod(F.xxhash64(key, F.lit(22), F.lit(seed)), F.lit(1000)),
            F.pmod(F.xxhash64(key, F.lit(23), F.lit(seed)), F.lit(10)),
        ),
    ).otherwise("")
    url = F.when(
        h(31) < 2,
        F.format_string(
            " see https://site%d.example.org/page/%d",
            F.pmod(F.xxhash64(key, F.lit(32), F.lit(seed)), F.lit(100)),
            F.pmod(F.xxhash64(key, F.lit(33), F.lit(seed)), F.lit(1000)),
        ),
    ).otherwise("")
    phone = F.when(
        h(41) < 2,
        F.format_string(
            " call +1-555-%03d-%04d",
            F.pmod(F.xxhash64(key, F.lit(42), F.lit(seed)), F.lit(1000)),
            F.pmod(F.xxhash64(key, F.lit(43), F.lit(seed)), F.lit(10000)),
        ),
    ).otherwise("")
    handle = F.when(
        h(51) < 2,
        F.format_string(
            " cc @agent%d",
            F.pmod(F.xxhash64(key, F.lit(52), F.lit(seed)), F.lit(100)),
        ),
    ).otherwise("")
    return F.concat(
        F.format_string("v%d ", version),
        w1, F.lit(" "), w2, F.lit(" "), w3,
        email, url, phone, handle,
    )


@dataclass(frozen=True)
class ChangeStreamSpec:
    """Knobs for the deterministic change stream (FIXTURES.md F2)."""

    n_conversations: int = 100
    base_turns: int = 8
    turn_spread: int = 8  # turns(c) = base + hash(c) % spread
    mega_frac: float = 0.2  # share of base turns held by conversation 0
    n_epochs: int = 4
    update_frac: float = 0.25
    update2_frac: float = 0.08  # second update → LWW conflict on same key
    delete_frac: float = 0.10
    dup_frac: float = 0.05  # exact re-delivery (same lsn) in a later epoch
    out_of_order: bool = True  # scatter lsn ranges across epochs
    seed: int = 42


def conversation_sizes(spec: ChangeStreamSpec) -> tuple[int, int]:
    """(mega_turns, total_base_turns) — computed deterministically."""
    # non-mega conversations: base + (c*2654435761 % spread), mean ≈ base + spread/2
    other = sum(
        spec.base_turns + ((c * 2654435761 + spec.seed) % spec.turn_spread)
        for c in range(1, spec.n_conversations)
    )
    mega = max(spec.base_turns, int(other * spec.mega_frac / (1.0 - spec.mega_frac)))
    return mega, mega + other


def base_turns(spark: SparkSession, spec: ChangeStreamSpec) -> DataFrame:
    """One row per (conv_id, turn_idx) with a global ``uid`` (0..N-1).

    uid doubles as the insert LSN: a total order over the log.
    """
    mega, _total = conversation_sizes(spec)
    convs = (
        spark.range(spec.n_conversations)
        .withColumnRenamed("id", "conv_idx")
        .withColumn(
            "n_turns",
            F.when(F.col("conv_idx") == 0, F.lit(mega)).otherwise(
                F.lit(spec.base_turns)
                + ((F.col("conv_idx") * 2654435761 + spec.seed) % spec.turn_spread)
            ),
        )
    )
    # cumulative offset per conversation → contiguous uid block.  The conv
    # table is tiny (≤ ~100k rows) so a single-partition running sum is fine;
    # at 10^10-event scale the offsets would be precomputed the same way
    # (they depend only on conv count, not on event volume).
    from pyspark.sql import Window

    w = Window.orderBy("conv_idx").rowsBetween(Window.unboundedPreceding, -1)
    convs = convs.withColumn("offset", F.coalesce(F.sum("n_turns").over(w), F.lit(0)))
    # the global window collapses to ONE partition — without an explicit
    # repartition every downstream explode/text-expression would inherit it
    # and the whole stream would be generated by a single task
    convs = convs.repartition(64, "conv_idx")
    turns = convs.select(
        "conv_idx",
        "offset",
        F.explode(F.sequence(F.lit(0), (F.col("n_turns") - 1).cast("int"))).alias("turn_idx"),
    ).withColumn("uid", F.col("offset") + F.col("turn_idx"))
    return turns.select("conv_idx", "turn_idx", "uid")


def _envelope(turns: DataFrame, version: int, lsn_block: int, total: int, op: str, spec: ChangeStreamSpec) -> DataFrame:
    seed = spec.seed
    uid = F.col("uid")
    role = _pick(_ROLES, uid, 1, seed)
    df = turns.select(
        (F.lit(lsn_block) * total + uid).alias("lsn"),
        F.lit(op).alias("op"),
        F.format_string("conv-%06d", F.col("conv_idx")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        (
            F.lit(None).cast("string")
            if op == "D"
            else _text_expr(uid, F.lit(version), seed)
        ).alias("text"),
        F.when(role == "tool", _pick(_TOOLS, uid, 2, seed)).otherwise(F.lit(None)).alias("tool"),
        (
            F.to_timestamp(F.lit(EPOCH_TS))
            + F.make_interval(secs=(uid % 86400) + F.lit(version * 86400))
        ).alias("ts"),
        F.col("uid"),
    )
    return df


def change_events(spark: SparkSession, spec: ChangeStreamSpec = ChangeStreamSpec()) -> DataFrame:
    """The full deterministic change stream (FIXTURES.md F2).

    Columns: lsn bigint, op string('I'|'U'|'D'), epoch_id bigint, conv_id,
    turn_idx int, role, text (null for D), tool, ts. LWW rule: max lsn wins
    per (conv_id, turn_idx); a 'D' winner means the row is absent from the
    final state (mirrors the reference's last-writer-wins upsert,
    PontusDiscoveryDBClassifierProcessor.java:253-273, generalized to CDC).
    """
    seed = spec.seed
    turns = base_turns(spark, spec)
    _mega, total = conversation_sizes(spec)

    inserts = _envelope(turns, 0, 0, total, "I", spec)
    updates = _envelope(
        turns.where(_u(F.col("uid"), 101, seed) < spec.update_frac), 1, 1, total, "U", spec
    )
    updates2 = _envelope(
        turns.where(_u(F.col("uid"), 102, seed) < spec.update2_frac), 2, 2, total, "U", spec
    )
    deletes = _envelope(
        turns.where(_u(F.col("uid"), 103, seed) < spec.delete_frac), 0, 3, total, "D", spec
    )

    events = inserts.unionByName(updates).unionByName(updates2).unionByName(deletes)

    # epoch assignment: ordered (lsn-contiguous) or scattered (out-of-order
    # delivery: an epoch can contain a 'D' whose matching 'I' arrives later).
    if spec.out_of_order:
        epoch = F.pmod(F.xxhash64(F.col("lsn"), F.lit(7), F.lit(seed)), F.lit(spec.n_epochs))
    else:
        epoch = F.least(
            F.floor(F.col("lsn") / F.lit(max(1, (4 * total) // spec.n_epochs))),
            F.lit(spec.n_epochs - 1),
        )
    events = events.withColumn("epoch_id", epoch.cast("long"))

    # duplicate delivery: re-emit an exact copy (same lsn) one epoch later.
    dups = (
        events.where((F.col("op") == "I") & (_u(F.col("uid"), 104, seed) < spec.dup_frac))
        .withColumn(
            "epoch_id",
            F.least(F.col("epoch_id") + 1, F.lit(spec.n_epochs - 1)).cast("long"),
        )
    )
    out = events.unionByName(dups).drop("uid")
    return out.select("lsn", "op", "epoch_id", "conv_id", "turn_idx", "role", "text", "tool", "ts")


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Reference final state computed *declaratively* (max-LSN LWW in one agg).

    Used as the Spark-side golden; the Python sequential oracle in
    ``oracle.py`` is the independent implementation tests compare against.
    """
    winner = F.max(F.struct("lsn", "op", "role", "text", "tool", "ts")).alias("w")
    final = events.groupBy("conv_id", "turn_idx").agg(winner)
    return (
        final.where(F.col("w.op") != "D")
        .select(
            "conv_id",
            "turn_idx",
            F.col("w.role").alias("role"),
            F.col("w.text").alias("text"),
            F.col("w.tool").alias("tool"),
            F.col("w.ts").alias("ts"),
        )
    )


def events_from_generic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided ``events`` parquet into a change stream.

    Deterministic mapping (no synthesis): event_id → lsn, user_id → conv_id,
    LCG-derived turn_idx / op. Uses only portable integer arithmetic so the
    exact same derivation is expressible in the DuckDB oracle SQL
    (xxhash64 would not be).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mix = (F.col("event_id") * 1103515245 + 12345) % 2147483647
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(mix % 10 < 1, "D").when(mix % 10 < 4, "U").otherwise("I").alias("op"),
        F.format_string("conv-%06d", F.pmod(F.col("user_id"), F.lit(500))).alias("conv_id"),
        ((mix / 7).cast("long") % 40).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )


# The same derivation as events_from_generic_table, as a DuckDB CTE body —
# kept adjacent so the two can't drift apart.
EVENTS_AS_CHANGES_SQL = """
    SELECT
      event_id AS lsn,
      CASE
        WHEN ((event_id * 1103515245 + 12345) % 2147483647) % 10 < 1 THEN 'D'
        WHEN ((event_id * 1103515245 + 12345) % 2147483647) % 10 < 4 THEN 'U'
        ELSE 'I'
      END AS op,
      printf('conv-%06d', user_id % 500) AS conv_id,
      CAST((((event_id * 1103515245 + 12345) % 2147483647) // 7) % 40 AS INTEGER) AS turn_idx,
      event_type AS role,
      props AS text,
      CAST(NULL AS VARCHAR) AS tool,
      ts
    FROM events
"""
