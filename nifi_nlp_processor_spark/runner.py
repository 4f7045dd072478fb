"""CDC apply loop: epochs → quarantine → enrich → LWW dedupe → MERGE.

The engine's hot path (SURVEY §4.3):

    change events (epoch)
      → validity split (dead-letter quarantine, never fail the batch)
      → optional vectorized enrichment (mapInPandas, Arrow batches)
      → LWW dedupe (partial+final agg — skew-safe)
      → LakeTable.merge_into (bucket copy-on-write, atomic manifest)
      → epoch metrics + LSN watermarks appended to the ledger

Exactly-once: the lake manifest records committed epoch ids; re-running an
epoch (restart, at-least-once re-delivery in foreachBatch) is a structural
no-op. This is the micro-batch generalization of the reference's per-record
session.commit() / idempotent set-union merge (PontusNLPProcessor.java:363;
PontusProcessorBase.java:303-327).

Batch mode (``apply_epochs``) drives the same per-epoch function the
streaming mode (``stream_apply``) hands to foreachBatch — one code path to
test, two delivery mechanisms.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.lake import MergeMetrics, ParquetLakeTable
from nifi_nlp_processor_spark.operators.quarantine import split_valid


@dataclass
class EpochResult:
    epoch_id: int
    merge: MergeMetrics
    quarantined: int = 0
    # set when this epoch tripped the auto-compaction threshold
    compacted: dict | None = None


@dataclass
class CdcEngine:
    lake: ParquetLakeTable
    quarantine_dir: str | None = None
    enrich: Callable[[DataFrame], DataFrame] | None = None
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    # "cow" rewrites touched buckets per epoch (read-optimal); "mor" appends
    # per-bucket LWW-deduped deltas without reading the target
    # (write-optimal — O(batch) bytes/epoch; see lake.merge_into)
    merge_mode: str = "cow"
    # "window" = one-shuffle merge (default); "agg" = max_by partial+final
    # aggregation whose map-side combine absorbs per-key duplicate storms
    # (see lake module docstring for the trade-off)
    lww_strategy: str = "window"
    # MoR deltas accumulate until compaction and the read-time fold scans
    # every delta in a bucket's chain; with a threshold set, the engine
    # compacts as soon as any bucket's chain reaches it, so read cost stays
    # bounded without an external maintenance scheduler (Iceberg analogue:
    # commit.manifest.min-count-to-merge-style inline maintenance).
    # None = manual compaction only.
    auto_compact_deltas: int | None = None
    results: list[EpochResult] = field(default_factory=list)

    def apply_epoch(
        self,
        batch: DataFrame,
        epoch_id: int,
        probe: dict[int, tuple[int, int]] | None = None,
    ) -> EpochResult:
        """Apply one micro-batch. Safe to call twice with the same epoch_id.
        ``probe``: a prefetched ``lake.probe_batch`` result over this
        batch's valid rows (see ``_prefetch_probe``) — skips the inline
        probe job."""
        if epoch_id in self.lake.committed_epochs():
            res = EpochResult(epoch_id=epoch_id, merge=MergeMetrics(epoch_id=epoch_id, skipped=True))
            self.results.append(res)
            return res

        valid, bad = split_valid(batch, list(self.key_cols))
        # Snapshot-cutover filter: after a bootstrap, every event at or
        # below the snapshot LSN is already reflected in the loaded state
        # and MUST be dropped — LWW alone cannot save the one bad case: a
        # key deleted BEFORE the snapshot has no tombstone in it (the
        # snapshot is live rows only), so a stale lsn<=W event for that key
        # would re-insert it. Reading the cutover from persisted table
        # props means a restarted engine on the same root enforces it too.
        cutover = self.lake.extra_props.get("bootstrap_lsn")
        if cutover is not None:
            valid = valid.where(F.col("lsn") > int(cutover))
        n_bad = 0
        if self.quarantine_dir is not None:
            # DLQ append (REL_FAILURE analogue). Counted via the write.
            bad_out = bad.withColumn("_epoch_id", F.lit(epoch_id))
            bad_out.write.mode("append").parquet(self.quarantine_dir)
            n_bad = -1  # count available from the quarantine table if needed

        # Probe the post-quarantine, PRE-enrichment frame: the probe still
        # scans only (bucket-key, lsn) — never text or the UDF stage — but
        # excludes DLQ-routed rows, so (a) a quarantined row with a null
        # lsn can never poison the probe's max() (a None watermark would
        # crash the merge after the data write, before the commit), (b) a
        # null bucket key never marks an unrelated bucket touched (write
        # amplification under a steady trickle of malformed events), and
        # (c) the commit watermarks mean "applied-through" — an LSN-based
        # resume reading them never skips a quarantined-then-fixed event.
        probe_src = valid
        if self.enrich is not None:
            valid = self.enrich(valid)

        # No separate dedupe pass: merge_into's LWW aggregation groups by
        # the same key and resolves intra-batch duplicates in the same
        # max_by it uses against the target — a standalone lww_dedupe here
        # would add a second full shuffle per epoch for nothing (the
        # operator remains available for standalone use).
        metrics = self.lake.merge_into(
            valid, epoch_id, probe_src=probe_src, mode=self.merge_mode,
            lww=self.lww_strategy, probe=probe,
        )
        res = EpochResult(epoch_id=epoch_id, merge=metrics, quarantined=n_bad)
        if self.auto_compact_deltas is not None and not metrics.skipped:
            ptrs = self.lake.last_commit()["buckets"]
            if any(
                len(p.get("deltas", [])) >= self.auto_compact_deltas
                for p in ptrs.values()
            ):
                res.compacted = self.lake.compact()
        self.results.append(res)
        return res

    def bootstrap(
        self, snapshot: DataFrame, as_of_lsn: int, epoch_id: int = -1
    ) -> EpochResult:
        """Initial-load handoff (Debezium's snapshot-then-stream cutover):
        load a consistent point-in-time snapshot — plain table state with
        NO lsn/op columns, consistent as of ``as_of_lsn`` — into an empty
        lake, then tail the change stream from any point at or before the
        snapshot with full overlap tolerance.

        Every snapshot row is stamped ``lsn = as_of_lsn, op = 'I'``; the
        cutover is persisted in the table properties and ``apply_epoch``
        thereafter drops events with ``lsn <= as_of_lsn`` (see the comment
        there for why the filter is required for correctness, not an
        optimization). Tail events above the cutover win LWW against the
        snapshot stamp as usual. The snapshot load is itself one idempotent
        epoch: O(snapshot) bytes written once, shuffled only on the bucket
        key — at 10^10 events this replaces replaying the entire history.

        ``epoch_id`` defaults to -1: streaming batch ids count up from 0,
        so the snapshot's ledger entry can never collide with (and silently
        swallow) the tail's first micro-batch.
        """
        if self.lake.committed_epochs():
            raise ValueError("bootstrap requires an empty lake (no committed epochs)")
        if self.lake.extra_props.get("bootstrap_lsn") is not None:
            raise ValueError("lake is already bootstrapped")
        src = snapshot.withColumn(
            "lsn", F.lit(int(as_of_lsn)).cast("long")
        ).withColumn("op", F.lit("I"))
        metrics = self.lake.merge_into(
            src, epoch_id, mode=self.merge_mode, lww=self.lww_strategy
        )
        self.lake.set_extra_prop("bootstrap_lsn", int(as_of_lsn))
        res = EpochResult(epoch_id=epoch_id, merge=metrics)
        self.results.append(res)
        return res

    def reprocess_quarantine(
        self,
        fix: Callable[[DataFrame], DataFrame],
        new_epoch_id: int,
        from_epochs: list[int] | None = None,
    ) -> EpochResult:
        """Repair loop for the dead-letter queue: read quarantined rows
        (optionally only those rejected in ``from_epochs``), run the
        caller's ``fix`` transform, and push the result through the normal
        apply path as a fresh epoch.

        Semantics that fall out of the engine rather than special cases:
        a repaired event applies with its ORIGINAL lsn, so one whose key
        was meanwhile updated by a higher LSN correctly loses LWW; rows
        the fix did not actually repair re-quarantine (the batch still
        commits); re-running the same repair epoch is a structural no-op
        (the ledger skips committed epochs). The DLQ itself is an
        append-only log — reprocessed rows stay in it as history, keyed by
        the ``_epoch_id`` that rejected them."""
        if self.quarantine_dir is None:
            raise ValueError("engine has no quarantine_dir")
        bad = self.lake.spark.read.parquet(self.quarantine_dir)
        if from_epochs is not None:
            bad = bad.where(F.col("_epoch_id").isin([int(e) for e in from_epochs]))
        fixed = fix(bad.drop("_reject_reason", "_epoch_id"))
        return self.apply_epoch(fixed, new_epoch_id)

    def _prefetch_probe(self, batch: DataFrame) -> dict[int, tuple[int, int]]:
        """The touched-bucket/watermark probe over the SAME rows
        ``apply_epoch`` would probe (post-quarantine valid rows, cutover
        filter applied) — runnable on a separate thread so the next
        epoch's probe overlaps the current epoch's merge job."""
        valid, _bad = split_valid(batch, list(self.key_cols))
        cutover = self.lake.extra_props.get("bootstrap_lsn")
        if cutover is not None:
            valid = valid.where(F.col("lsn") > int(cutover))
        return self.lake.probe_batch(valid)

    def apply_epochs(
        self,
        events: DataFrame,
        epoch_col: str = "epoch_id",
        epoch_ids: list[int] | None = None,
        prefetch_probes: bool = True,
    ) -> list[EpochResult]:
        """Batch replay: partition the change stream by epoch and apply in
        epoch order. Epoch ids are collected (small: one per micro-batch),
        the events themselves never reach the driver; pass ``epoch_ids``
        when the caller already knows them to skip the discovery job.

        With ``prefetch_probes`` (default) ALL epochs' touched-bucket
        probes are computed in ONE up-front grouped job
        (``lake.probe_epochs`` over the post-quarantine valid rows, same
        cutover filter as ``apply_epoch``): the probe is a serialized
        plan-time dependency of each merge (it sizes the write salt and
        picks target buckets), so batching it pays one probe-job latency
        for the whole replay instead of one per epoch — strictly better
        than round 4's thread-prefetch, which still ran epoch 0's probe
        inline and had the background probe competing with the live merge
        for executor slots. ``False`` runs each epoch's probe inline (the
        diagnostic / A-B baseline path)."""
        if epoch_ids is None:
            epoch_ids = sorted(
                r[0] for r in events.select(epoch_col).distinct().collect()
            )
        out = []
        if not prefetch_probes:
            for e in epoch_ids:
                out.append(self.apply_epoch(events.where(F.col(epoch_col) == e), int(e)))
            return out
        valid, _bad = split_valid(events, list(self.key_cols))
        cutover = self.lake.extra_props.get("bootstrap_lsn")
        if cutover is not None:
            valid = valid.where(F.col("lsn") > int(cutover))
        # probe only the epochs this replay applies — a caller replaying a
        # prefix (warmup, resumed/phased applies) must not pay for the rest
        probes = self.lake.probe_epochs(
            valid.where(F.col(epoch_col).isin([int(e) for e in epoch_ids])), epoch_col
        )
        for e in epoch_ids:
            out.append(
                self.apply_epoch(
                    events.where(F.col(epoch_col) == e),
                    int(e),
                    probe=probes.get(int(e), {}),
                )
            )
        return out

    def lineage(self) -> list[dict]:
        """Per-epoch lineage from the commit ledger (rows applied, conflict
        counts, per-bucket LSN watermarks) — the metrics export the north
        rule requires."""
        return [c["metrics"] | {"watermarks": c["watermarks"]} for c in self.lake.commit_history()]

    def save_lineage(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.lineage(), fh, indent=2)


@dataclass
class MultiTableEngine:
    """Route one interleaved change stream (a binlog/WAL tails EVERY table)
    to per-table lake upserts — the Debezium→lake fan-out.

    Each table gets its own ``CdcEngine`` + lake; an epoch is applied by
    filtering the batch per table and running the normal apply path.
    Cross-table atomicity is by IDEMPOTENT RESUME, not a global lock: the
    per-table epoch ledgers mean a crash between table A's and table B's
    manifest publishes leaves A committed and B not — re-running the epoch
    (foreachBatch re-delivery or batch replay) skips A structurally and
    completes B, converging to the same state as an uninterrupted run
    (tests/test_multi_table.py proves it by killing between publishes).
    Readers of a single table always see a consistent snapshot of it; a
    cross-table read is consistent for every epoch below the min of the
    tables' committed heads.

    Scale shape: the batch is analyzed once per table with the ``table =
    'x'`` filter pushed to the (parquet/Kafka) source scan — no driver-side
    row routing, no extra shuffle beyond each table's own bucket exchange.
    Events for unknown tables are counted and dropped (or quarantined by
    the caller pre-routing) rather than failing the epoch.
    """

    engines: dict[str, CdcEngine]
    table_col: str = "table"

    def apply_epoch(self, batch: DataFrame, epoch_id: int) -> dict[str, EpochResult]:
        # deterministic table order so a crash/resume always replays the
        # same prefix. Every table's touched-bucket probe is independent of
        # every other table's merge, so they are all submitted up front on
        # a thread pool: table k's probe overlaps tables 0..k-1's merges
        # instead of serializing one probe job per table per epoch.
        from concurrent.futures import ThreadPoolExecutor

        names = sorted(self.engines)
        subs = {
            n: batch.where(F.col(self.table_col) == n).drop(self.table_col)
            for n in names
        }
        out: dict[str, EpochResult] = {}
        # pool capped: each probe is a real Spark job, and an uncapped
        # many-table engine would submit them all at once — oversubscribing
        # the scheduler and competing with the serial merges the overlap is
        # meant to hide. 4 in flight keeps the next few tables' probes warm
        # while never swamping the running merge.
        with ThreadPoolExecutor(max_workers=min(4, max(1, len(names)))) as pool:
            futs = {
                n: pool.submit(self.engines[n]._prefetch_probe, subs[n])
                for n in names
            }
            for name in names:
                out[name] = self.engines[name].apply_epoch(
                    subs[name], epoch_id, probe=futs[name].result()
                )
        return out

    def apply_epochs(
        self,
        events: DataFrame,
        epoch_col: str = "epoch_id",
        epoch_ids: list[int] | None = None,
    ) -> list[dict[str, EpochResult]]:
        if epoch_ids is None:
            epoch_ids = sorted(
                r[0] for r in events.select(epoch_col).distinct().collect()
            )
        return [
            self.apply_epoch(events.where(F.col(epoch_col) == e), int(e))
            for e in epoch_ids
        ]

    def read(self, table: str) -> DataFrame:
        return self.engines[table].lake.read()


def stream_apply(
    engine: CdcEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Structured Streaming delivery: readStream source → foreachBatch(apply_epoch).

    Spark's checkpoint gives at-least-once batch re-delivery; the lake's
    epoch ledger upgrades it to exactly-once. Returns the started query.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_epoch(batch_df, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


@contextmanager
def managed_stream(
    engine: CdcEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Managed teardown for the streaming query (L3 — the ``@OnStopped``
    analogue, PontusProcessorBase.java:296-301 / writer close
    PontusLuceneIndexWriterProcessor.java:139-143): the query is stopped on
    scope exit even when the body raises, so no orphan micro-batch keeps
    writing after the caller is gone. Safe with exactly-once: a batch
    interrupted before its manifest rename never published, and re-running
    it from the checkpoint is idempotent (the ledger skips committed
    epochs).
    """
    q = stream_apply(engine, stream_df, checkpoint_dir, trigger_once=trigger_once)
    try:
        yield q
    finally:
        if q.isActive:
            q.stop()
