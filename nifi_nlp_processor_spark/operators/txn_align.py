"""Transaction-aligned apply: binlog txn atomicity across micro-batches.

A binlog/WAL groups change events into source transactions; a relay
delivers them interleaved and a micro-batch boundary can land MID-txn.
Applying the prefix of a split txn exposes readers to a state the source
database never had (the classic torn-transaction anomaly Debezium users
hit when sinking to batchy targets). ``TxnAlignedApply`` restores source
atomicity ON TOP of the engine's epoch semantics:

* events whose txn commit marker has arrived (or that carry no txn id —
  autocommit/non-transactional sources) apply in the current epoch;
* events of still-open txns are DEFERRED to a pending sidecar and join the
  next epoch's batch, repeatedly, until their commit record shows up;
* the pending sidecar is snapshotted per epoch with an atomic
  ``_SUCCESS``-terminated write, and both the split and the sidecar are
  DETERMINISTIC functions of (previous sidecar, batch) — so a crash
  anywhere between sidecar write and lake commit replays convergently:
  the lake's epoch ledger skips what committed, the recomputed sidecar is
  byte-identical, and LWW absorbs any double-applied event (same lsn).

Scale shape: completeness detection is one partial+final aggregate over
(txn_id) of the combined frame plus a broadcast-friendly semi/anti join —
pending state is bounded by open-txn volume (interval × write rate), never
by stream length. No driver-side row handling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TxnAlignedApply:
    """Wrap any ``apply_epoch(batch, epoch_id)`` engine (CdcEngine,
    MultiTableEngine) with source-transaction alignment.

    ``txn_col`` carries the source txn id (null ⇒ non-transactional, apply
    immediately); ``commit_col`` is true on a txn's commit record (the last
    event Debezium emits for it)."""

    engine: object
    pending_dir: str
    txn_col: str = "txn_id"
    commit_col: str = "txn_commit"
    results: list = field(default_factory=list)

    def _pending_snapshots(self) -> list[int]:
        if not os.path.isdir(self.pending_dir):
            return []
        out = []
        for d in os.listdir(self.pending_dir):
            if d.startswith("p") and os.path.exists(
                os.path.join(self.pending_dir, d, "_SUCCESS")
            ):
                out.append(int(d[1:]))
        return sorted(out)

    def pending(self, before_epoch: int | None = None) -> DataFrame | None:
        """The latest committed pending snapshot (optionally only those
        strictly below ``before_epoch`` — what a replay of that epoch must
        see, not what it produced)."""
        snaps = self._pending_snapshots()
        if before_epoch is not None:
            snaps = [s for s in snaps if s < before_epoch]
        if not snaps:
            return None
        path = os.path.join(self.pending_dir, f"p{snaps[-1]:08d}")
        return self._spark().read.parquet(path)

    def _spark(self) -> SparkSession:
        lake = getattr(self.engine, "lake", None)
        if lake is not None:
            return lake.spark
        engines = getattr(self.engine, "engines", None)
        if engines:
            return next(iter(engines.values())).lake.spark
        return SparkSession.getActiveSession()

    def apply_epoch(self, batch: DataFrame, epoch_id: int):
        prev = self.pending(before_epoch=epoch_id)
        events = batch if prev is None else prev.unionByName(batch)
        # one aggregate: which txns have their commit record by now
        done = (
            events.where(F.col(self.txn_col).isNotNull())
            .groupBy(self.txn_col)
            .agg(F.max(F.col(self.commit_col).cast("int")).alias("_c"))
            .where(F.col("_c") == 1)
            .select(self.txn_col)
        )
        ready = events.where(F.col(self.txn_col).isNull()).unionByName(
            events.join(F.broadcast(done), self.txn_col, "left_semi")
        )
        deferred = events.where(F.col(self.txn_col).isNotNull()).join(
            F.broadcast(done), self.txn_col, "left_anti"
        )
        # sidecar BEFORE the lake commit: both are idempotent, and the
        # sidecar is a deterministic function of (prev sidecar, batch), so
        # any crash ordering converges on replay
        out = os.path.join(self.pending_dir, f"p{epoch_id:08d}")
        deferred.write.mode("overwrite").parquet(out)
        res = self.engine.apply_epoch(
            ready.drop(self.txn_col, self.commit_col), epoch_id
        )
        # GC: a replay of any epoch <= epoch_id needs at most the newest
        # snapshot below it; everything older than the newest-below-current
        # is unreachable
        snaps = self._pending_snapshots()
        keep = {epoch_id}
        below = [s for s in snaps if s < epoch_id]
        if below:
            keep.add(below[-1])
        for s in snaps:
            if s not in keep:
                import shutil

                shutil.rmtree(
                    os.path.join(self.pending_dir, f"p{s:08d}"), ignore_errors=True
                )
        self.results.append(res)
        return res

    def open_txn_count(self) -> int:
        p = self.pending()
        if p is None:
            return 0
        return p.select(self.txn_col).distinct().count()
