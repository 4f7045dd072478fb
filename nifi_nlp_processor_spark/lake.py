"""Lake-table abstraction: MERGE-INTO upsert target with exactly-once commits.

The north rule targets Iceberg ``MERGE INTO``; the Iceberg runtime jar is not
available in this sandbox, so the same semantics are implemented as a
parquet "mini-lake" behind one interface (SURVEY §7 M1 fallback):

* **Copy-on-write at bucket granularity** — rows are hash-bucketed on
  ``conv_id`` (the Iceberg analogue is a ``bucket(conv_id)`` hidden
  partition). A merge rewrites only the buckets the source batch touches;
  untouched buckets are inherited by pointer. This bounds write
  amplification exactly the way Iceberg's copy-on-write MERGE bounds it at
  file granularity, and keeps each conversation's turns co-located so the
  LWW merge shuffle partitions by the same key every epoch.
* **Merge-on-read mode** (``merge_into(mode="mor")``) — the Iceberg
  equality-delete analogue (the layout Flink CDC writes): an epoch's rows
  are LWW-deduped within the batch and appended as per-bucket *delta* file
  sets without ever reading the target, so bytes written per epoch is
  O(batch) instead of O(touched buckets). Reads fold base+deltas through
  the same LWW expressions the CoW merge uses (``lww_payload_order`` — one
  definition, so staged folds provably agree with single-pass merges), and
  ``compact()`` folds deltas back into one base file per bucket. CoW is
  read-optimal, MoR is write-optimal; mix freely per epoch.
* **Atomic snapshot commits** — each merge writes data files under a fresh
  commit directory, then publishes a JSON manifest via atomic ``rename``.
  The manifest is the commit point: readers only see renamed manifests, and
  orphaned data files from a crashed merge are invisible (Iceberg snapshot
  semantics).
* **Exactly-once epochs** — the manifest records ``epoch_id``; re-applying
  an already-committed epoch is a structural no-op (checked before any
  work). This is the epoch-commit ledger of SURVEY §4.2 #2, and the batch
  generalization of the reference's idempotent set-union merge
  (PontusProcessorBase.java:303-327: re-adding the same values is a no-op).
* **Retained tombstones** — deletes are stored as ``_deleted=true`` rows
  with their LSN, so a lower-LSN insert delivered in a *later* epoch still
  loses (out-of-order delivery across epochs). ``read()`` filters them.
* **Schema evolution** — per-epoch schema diff: new columns are appended
  (nullable), int→long / float→double widenings are applied, and old data
  files are read through the current schema with cast-alignment (Iceberg
  ``ALTER TABLE ADD COLUMN`` / type-promotion semantics, SURVEY §4.2 #3).
* **LWW merge rule** — max ``lsn`` wins per (conv_id, turn_idx), the
  distributed form of the reference's max-frequency last-writer-wins upsert
  (PontusDiscoveryDBClassifierProcessor.java:253-273). Two physical
  strategies over the same total order (``lww_payload_order``):

  - ``lww="window"`` (default) — ONE shuffle per epoch: rows are
    hash-partitioned straight into the (bucket, write-salt) layout the
    file write needs, and the winner per key is ``row_number()==1`` over a
    window partitioned by (bucket, salt, key) ordered by the LWW order
    descending. Hash partitioning on (bucket, salt) — both functions of
    the key — already clusters every key, so the window adds a sort but NO
    second exchange, and the write inherits the layout as-is. Fewer stage
    barriers and ~30% less shuffled data than the agg strategy at typical
    duplicate rates (measured: 1.15-1.25× faster end-to-end at 2 AND 8
    cores, and a better 2→8 scaling slope — see BENCH/BASELINE.md).
  - ``lww="agg"`` — ``max_by(payload, order)`` partial+final aggregation,
    then a second exchange into the write layout. The map-side combine
    folds per-key duplicates BEFORE the shuffle, so it stays the right
    choice when single keys receive duplicate-delivery storms (thousands
    of copies of one (conv_id, turn_idx) per epoch); at ordinary dup
    rates the combine saves less than the extra exchange costs.

  A mega-conversation (hot conv_id, many distinct keys) is handled the
  same way by both: an ADAPTIVE write salt splits each touched bucket
  across as many tasks/files as its rewrite size warrants (probe row
  counts + manifest-recorded per-part rows, ROWS_PER_WRITE_TASK per task,
  capped at MAX_WRITE_SALT) — a hot bucket fans out, a cold bucket stays
  one right-sized file instead of 8 tiny ones. Both strategies resolve by
  the identical order struct, so winners — tie-breaks included — are
  bit-identical (asserted in tests).

Single-writer assumption: one runner commits at a time (the driver of the
streaming query). Concurrent writers would need the optimistic-retry loop
Iceberg provides; out of scope here.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_LSN = "_lsn"
META_DELETED = "_deleted"
BUCKET_COL = "_b"
# write-path salt fan-out per bucket (skewed-bucket parallelism; see merge_into)
WRITE_SALT = 8
# adaptive write-salt sizing (merge_into): one write task/file per this many
# rows of a bucket's rewrite, capped — at ~1 KB/row this targets the
# 100-200 MB parquet files a 100 TB table wants, instead of salting every
# cold bucket 8× (maintenance rewrites keep the fixed WRITE_SALT: they
# always rewrite whole buckets, where a fixed split is the point)
ROWS_PER_WRITE_TASK = 100_000
MAX_WRITE_SALT = 64
# bucket→fan-out lookup strategy cutover: a literal create_map lookup is a
# LINEAR scan of the map per row in codegen (GetMapValue over
# ArrayBasedMapData has no hash index), so it is only used while the map is
# small; a wide epoch (hundreds+ touched buckets) switches to a broadcast
# hash join against a tiny (bucket, fanout) table — O(1) per row
SALT_MAP_LITERAL_MAX = 64

# Iceberg-style type promotions we accept when an epoch widens a column.
# Names are DataType.simpleString() values ("int", "bigint", ...).
_WIDENINGS = {
    ("int", "bigint"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("date", "timestamp"),
}


def _rank(dt: T.DataType) -> str:
    return dt.simpleString()


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Smallest common type of a and b under the supported promotions."""
    if a == b:
        return a
    if (_rank(a), _rank(b)) in _WIDENINGS:
        return b
    if (_rank(b), _rank(a)) in _WIDENINGS:
        return a
    raise ValueError(f"unsupported schema change: {_rank(a)} vs {_rank(b)}")


def evolve_schema(current: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """Merge incoming batch schema into the table schema (add + widen)."""
    fields = {f.name: f for f in current.fields}
    order = [f.name for f in current.fields]
    changed = False
    for f in incoming.fields:
        if f.name in fields:
            w = widen(fields[f.name].dataType, f.dataType)
            if w != fields[f.name].dataType:
                fields[f.name] = T.StructField(f.name, w, True)
                changed = True
        else:
            fields[f.name] = T.StructField(f.name, f.dataType, True)
            order.append(f.name)
            changed = True
    return T.StructType([fields[n] for n in order]), changed


def lww_payload_order(non_key: list[str]) -> tuple:
    """The ONE pair of (payload, order) struct expressions every LWW
    resolution in the lake uses — the copy-on-write merge aggregation and
    the merge-on-read read/compaction fold share these verbatim, so a row
    set resolved in one pass (CoW) and the same rows resolved in stages
    (MoR: batch fold at write, base+delta fold at read) pick the same
    winner, tie-breaks included.

    ``max_by(payload, order)`` beats ``max(struct(...))`` ~3× because the
    aggregation buffer compares the small order key, not the full payload
    (text included); the content hash keeps same-LSN ties deterministic
    across cluster sizes, replays, and staged folds. Iterated max_by over a
    total order is associative, which is exactly what makes the staged MoR
    fold equal to the single-pass CoW merge."""
    payload = F.struct(
        F.col(META_LSN), F.col(META_DELETED), *[F.col(c) for c in non_key]
    )
    order = F.struct(
        F.col(META_LSN),
        F.col(META_DELETED),
        # zero-arg xxhash64 is an AnalysisException (key-only schemas)
        (F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.lit(0)).alias("_h"),
    )
    return payload, order


def align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto ``schema``: missing columns become typed nulls,
    present columns are cast (the read path for old-schema data files)."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


@dataclass
class MergeMetrics:
    epoch_id: int
    mode: str = "cow"  # 'mor' merges report unknowable conflict counts as -1
    skipped: bool = False
    rows_in_batch: int = 0
    keys_in_batch: int = 0
    rows_applied: int = 0
    updated: int = 0
    inserted: int = 0
    deleted: int = 0
    stale: int = 0  # source rows that lost LWW to an existing higher LSN
    buckets_touched: int = 0
    lsn_watermarks: dict[str, int] = field(default_factory=dict)
    wall_sec: float = 0.0
    probe_sec: float = 0.0  # staging scan + touched-bucket/watermark probe
    write_sec: float = 0.0  # merge aggregation + salted bucket write

    def as_dict(self) -> dict:
        return {
            "epoch_id": self.epoch_id,
            "mode": self.mode,
            "skipped": self.skipped,
            "rows_in_batch": self.rows_in_batch,
            "keys_in_batch": self.keys_in_batch,
            "rows_applied": self.rows_applied,
            "updated": self.updated,
            "inserted": self.inserted,
            "deleted": self.deleted,
            "stale": self.stale,
            "buckets_touched": self.buckets_touched,
            "lsn_watermarks": self.lsn_watermarks,
            "wall_sec": self.wall_sec,
            "probe_sec": self.probe_sec,
            "write_sec": self.write_sec,
        }


class ParquetLakeTable:
    """Parquet mini-lake with Iceberg-shaped MERGE semantics (module doc)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_key: str = "conv_id",
        n_buckets: int = 32,
        stats_cols: tuple[str, ...] = (),
    ):
        """``key_cols``/``bucket_key``/``n_buckets`` are CREATION-time
        properties. They are persisted in ``_table.json`` next to the data
        (the Iceberg analogue: the partition spec lives in table metadata,
        not in reader code), and re-opening an existing root ADOPTS the
        stored values — otherwise a second writer opened with a different
        bucket count would route a key's new rows to a different bucket
        than its history lives in, and the per-bucket merge would silently
        duplicate the key. Change the layout via ``rebucket``, never via
        constructor args."""
        self.spark = spark
        self.root = root
        self._commit_cache: dict[str, dict] = {}
        self._schema_cache: dict[str, T.StructType] = {}
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "_schema"), exist_ok=True)
        props_path = os.path.join(root, "_table.json")
        if os.path.exists(props_path):
            with open(props_path) as fh:
                props = json.load(fh)
            self.key_cols = list(props["key_cols"])
            self.bucket_key = props["bucket_key"]
            self.n_buckets = int(props["n_buckets"])
            self.stats_cols = list(props.get("stats_cols", []))
            self.extra_props = dict(props.get("extra", {}))
        else:
            self.key_cols = list(key_cols)
            self.bucket_key = bucket_key
            self.n_buckets = n_buckets
            self.stats_cols = list(stats_cols)
            self.extra_props = {}
            self._write_props()

    def _write_props(self) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".tmp-props-")
        with os.fdopen(fd, "w") as fh:
            json.dump(
                {
                    "key_cols": self.key_cols,
                    "bucket_key": self.bucket_key,
                    "n_buckets": self.n_buckets,
                    "stats_cols": self.stats_cols,
                    "extra": self.extra_props,
                },
                fh,
            )
        os.rename(tmp, os.path.join(self.root, "_table.json"))

    def set_extra_prop(self, key: str, value) -> None:
        """Persist an engine-level table property (Iceberg table-properties
        analogue) — e.g. the bootstrap LSN cutover — atomically alongside
        the layout, so any writer reopening the root adopts it."""
        self.extra_props[key] = value
        self._write_props()

    # ---- commit log -------------------------------------------------
    #
    # Published manifests are IMMUTABLE (atomic rename, never rewritten),
    # so parsed manifests are cached per handle keyed by filename: the
    # listdir stays the source of truth for WHICH commits exist (a
    # concurrent writer's publishes are picked up on the next call), but
    # each manifest is parsed once. Without the cache every epoch re-parses
    # the whole ledger — an O(epochs²) driver-side term over a long replay
    # that lands squarely in the per-epoch fixed cost the scaling gate
    # measures.

    def _commit_files(self) -> list[str]:
        d = os.path.join(self.root, "_commits")
        return sorted(f for f in os.listdir(d) if f.startswith("commit-"))

    def _read_commit(self, fname: str) -> dict:
        c = self._commit_cache.get(fname)
        if c is None:
            with open(os.path.join(self.root, "_commits", fname)) as fh:
                c = json.load(fh)
            self._commit_cache[fname] = c
        return c

    def last_commit(self) -> dict | None:
        files = self._commit_files()
        if not files:
            return None
        return self._read_commit(files[-1])

    def committed_epochs(self) -> set[int]:
        out = set()
        for f in self._commit_files():
            e = self._read_commit(f)["epoch_id"]
            if e is not None:  # maintenance commits (compact) are not epochs
                out.add(e)
        return out

    def commit_history(self) -> list[dict]:
        return [self._read_commit(f) for f in self._commit_files()]

    def commit_at(self, seq: int) -> dict:
        """Manifest of snapshot ``seq`` (time travel anchor)."""
        path = os.path.join(self.root, "_commits", f"commit-{seq:08d}.json")
        if not os.path.exists(path):
            raise ValueError(f"no snapshot with seq {seq}")
        with open(path) as fh:
            return json.load(fh)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg expire_snapshots analogue: reclaim data of snapshots
        older than the last ``keep_last``.

        Deletes commit data directories (``data/cNNNNNNNN``) referenced by
        NO retained manifest — a retained manifest may still point into an
        old commit dir for buckets untouched since, and those survive.
        Also removes dead orphan dirs from crashed writes (a dir whose seq
        was later won by a published manifest); an orphan with seq beyond
        the ledger head is kept — it may belong to an in-flight writer
        that has not published yet.

        Manifests themselves are NEVER deleted: they are the exactly-once
        epoch ledger (``committed_epochs``) and the lineage/watermark
        history, and they are tiny JSON. Time travel to a seq whose data
        was expired raises at read time.

        TAGGED snapshots (``tag``) are pinned: their data survives any
        ``keep_last`` until the tag is dropped — the Iceberg tag-retention
        contract that makes a tag a reproducible dataset release, not just
        a name.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the head is never expired)")
        commits = self.commit_history()
        pinned = set(self.tags().values())
        retained = commits[-keep_last:] + [c for c in commits if c["seq"] in pinned]
        referenced = {
            part["path"].split("/")[1]
            for c in retained
            for ptr in c["buckets"].values()
            for part in self._ptr_parts(ptr)  # base AND merge-on-read deltas
        }
        max_seq = commits[-1]["seq"] if commits else 0
        data_root = os.path.join(self.root, "data")
        removed: list[str] = []
        reclaimed = 0
        if os.path.exists(data_root):
            for d in sorted(os.listdir(data_root)):
                try:
                    seq = int(d.lstrip("c"))
                except ValueError:
                    continue
                if d in referenced or seq > max_seq:
                    continue
                p = os.path.join(data_root, d)
                for dirpath, _dirs, files in os.walk(p):
                    reclaimed += sum(
                        os.path.getsize(os.path.join(dirpath, f)) for f in files
                    )
                shutil.rmtree(p)
                removed.append(d)
        return {
            "removed_dirs": removed,
            "bytes_reclaimed": reclaimed,
            "retained_seqs": [c["seq"] for c in retained],
        }

    def tag(self, name: str, seq: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg tag analogue): the
        reproducible-dataset primitive — "train-v3 is seq 41" survives any
        later ingest AND ``expire_snapshots`` until the tag is dropped.
        Defaults to the current head. Stored in table metadata atomically;
        re-tagging an existing name moves it."""
        if seq is None:
            head = self.last_commit()
            if head is None:
                raise ValueError("cannot tag an empty table")
            seq = head["seq"]
        self.commit_at(int(seq))  # raises if no such snapshot
        tags = dict(self.extra_props.get("tags", {}))
        tags[name] = int(seq)
        self.set_extra_prop("tags", tags)
        return int(seq)

    def drop_tag(self, name: str) -> None:
        tags = dict(self.extra_props.get("tags", {}))
        tags.pop(name, None)
        self.set_extra_prop("tags", tags)

    def tags(self) -> dict[str, int]:
        return {k: int(v) for k, v in self.extra_props.get("tags", {}).items()}

    def read_tag(self, name: str) -> DataFrame:
        """Snapshot read by tag name — time travel with a stable handle."""
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"unknown tag {name!r} (have: {sorted(tags)})")
        return self.read(at_seq=tags[name])

    def fsck(self, repair: bool = False) -> dict:
        """Table integrity check (and crash-debris repair) — the ops tool a
        10^10-event lake needs after driver crashes and kill -9s.

        Verifies, without touching a data file's contents:

        * every ledger manifest parses, its ``seq`` matches its filename,
          and its schema version file exists (``bad_manifests``);
        * every bucket pointer of every manifest — base file sets AND
          merge-on-read deltas — resolves to an existing directory
          (``missing_paths``: real corruption, unrepairable here; restore
          from a replica or re-replay the source);
        * data commit dirs referenced by NO manifest are classified dead
          (``seq <=`` ledger head: a writer crashed between data write and
          manifest publish — the atomic-rename commit protocol makes them
          invisible but they hold disk) or in-flight (``seq >`` head: an
          unpublished writer may still be running — never touched);
        * stale ``.tmp-*`` manifest droppings from interrupted publishes.

        With ``repair=True`` dead orphan dirs and tmp droppings are
        deleted. This is ZERO-data-loss repair — unlike
        ``expire_snapshots`` it never removes data referenced by any
        manifest, so time travel is unaffected. Cost: one listdir of
        ``data/`` + the manifest JSONs + one existence stat per bucket
        pointer — O(commits × buckets), no data-file listing, no Spark job.
        """
        commits_dir = os.path.join(self.root, "_commits")
        data_root = os.path.join(self.root, "data")
        report: dict = {
            "bad_manifests": [],
            "missing_paths": [],
            "dead_orphan_dirs": [],
            "inflight_dirs": [],
            "tmp_manifests": [],
            "removed": [],
            "ok": True,
        }
        commits: list[dict] = []
        for f in self._commit_files():
            path = os.path.join(commits_dir, f)
            try:
                with open(path) as fh:
                    c = json.load(fh)
                if f != f"commit-{c['seq']:08d}.json":
                    raise ValueError(f"seq {c['seq']} != filename {f}")
                if not os.path.exists(os.path.join(self.root, "_schema", c["schema"])):
                    raise ValueError(f"schema file {c['schema']} missing")
                commits.append(c)
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                report["bad_manifests"].append({"file": f, "error": str(e)})
        referenced: set[str] = set()
        for c in commits:
            for ptr in c["buckets"].values():
                for part in self._ptr_parts(ptr):
                    referenced.add(part["path"].split("/")[1])
                    if not os.path.exists(os.path.join(self.root, part["path"])):
                        report["missing_paths"].append(
                            {"seq": c["seq"], "path": part["path"]}
                        )
        max_seq = commits[-1]["seq"] if commits else 0
        if os.path.exists(data_root):
            for d in sorted(os.listdir(data_root)):
                try:
                    seq = int(d.lstrip("c"))
                except ValueError:
                    continue
                if d in referenced:
                    continue
                kind = "inflight_dirs" if seq > max_seq else "dead_orphan_dirs"
                report[kind].append(d)
        report["tmp_manifests"] = sorted(
            f for f in os.listdir(commits_dir) if f.startswith(".tmp-")
        )
        report["ok"] = not (
            report["bad_manifests"] or report["missing_paths"]
        )
        if repair:
            for d in report["dead_orphan_dirs"]:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                report["removed"].append(f"data/{d}")
            for f in report["tmp_manifests"]:
                os.remove(os.path.join(commits_dir, f))
                report["removed"].append(f"_commits/{f}")
        return report

    def compact(self, min_files: int = 2) -> dict:
        """Iceberg ``rewrite_data_files`` (bin-pack compaction) analogue.

        Copy-on-write at bucket granularity accretes one file set per
        touched epoch ONLY until the next merge rewrites the bucket — but a
        bucket that keeps winning small epochs can still fragment into many
        small salted files, and small files are the classic lake read-path
        killer (footer/open overhead per file, tiny row groups defeat
        column-chunk skipping). ``compact`` rewrites every bucket whose
        pointer currently holds ≥ ``min_files`` data files into a single
        sorted file and publishes a MAINTENANCE commit: same epoch ledger
        (``epoch_id: null`` — ``committed_epochs`` and exactly-once are
        untouched), same watermarks, same logical rows (tombstones
        included, byte-identical state), new pointers. Old snapshots still
        time-travel until ``expire_snapshots`` reclaims them.

        Buckets are rewritten through the CURRENT schema (compaction is
        also the natural point to retire old-schema files). Returns
        ``{buckets_compacted, files_before, files_after, seq}``."""
        prev = self.last_commit()
        if prev is None:
            return {"buckets_compacted": 0, "files_before": 0, "files_after": 0, "seq": 0}
        schema = self.current_schema()
        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )

        def _files(ptr: dict) -> list[str]:
            out = []
            for part in self._ptr_parts(ptr):
                d = os.path.join(self.root, part["path"])
                out.extend(f for f in os.listdir(d) if f.endswith(".parquet"))
            return out

        # a bucket qualifies on fragmentation OR on carrying merge-on-read
        # deltas — compaction is what retires deltas and restores the
        # read-optimal one-version-per-key layout (Iceberg: rewrite_data_files
        # over a MoR table applies the equality deletes)
        todo = {
            b: ptr
            for b, ptr in prev["buckets"].items()
            if len(_files(ptr)) >= min_files or ptr.get("deltas")
        }
        files_before = sum(len(_files(p)) for p in todo.values())
        if not todo:
            return {
                "buckets_compacted": 0,
                "files_before": 0,
                "files_after": 0,
                "seq": prev["seq"],
            }
        seq = prev["seq"] + 1
        commit_dir = f"data/c{seq:08d}"
        abs_dir = os.path.join(self.root, commit_dir)
        df = self._read_manifest_buckets(prev, sorted(todo), full).withColumn(
            BUCKET_COL, self._bucket_expr()
        )
        # one task per bucket → one output file per bucket, sorted on the
        # merge key so row groups stay range-clustered for turn scans
        (
            df.repartition(len(todo), F.col(BUCKET_COL))
            .sortWithinPartitions(*self.key_cols)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(abs_dir)
        )
        buckets = dict(prev["buckets"])
        schema_name = prev["schema"]
        cstats = (
            self._collect_part_stats(abs_dir, self.current_schema())
            if self.stats_cols
            else {}
        )
        crows = self._part_rows(abs_dir)
        for d in os.listdir(abs_dir):
            if d.startswith(f"{BUCKET_COL}="):
                b = d.split("=")[1]
                buckets[b] = {
                    "path": f"{commit_dir}/{d}",
                    "schema": schema_name,
                    "rows": crows.get(int(b), 0),
                }
                if int(b) in cstats:
                    buckets[b]["stats"] = cstats[int(b)]
        files_after = sum(
            len(_files(buckets[b])) for b in todo
        )
        commit = {
            "seq": seq,
            "epoch_id": None,  # maintenance commit: not an epoch
            "schema": schema_name,
            "schema_version": prev["schema_version"],
            "buckets": buckets,
            "watermarks": prev.get("watermarks", {}),
            "metrics": {
                "maintenance": "compact",
                "buckets_compacted": len(todo),
                "files_before": files_before,
                "files_after": files_after,
            },
        }
        self._publish(commit)
        return {
            "buckets_compacted": len(todo),
            "files_before": files_before,
            "files_after": files_after,
            "seq": seq,
        }

    def rebucket(self, n_buckets: int) -> dict:
        """Bucket-layout evolution (the Iceberg partition-spec-evolution
        analogue): rewrite the live table under a new bucket count in ONE
        maintenance commit. At 10^10 events the right bucket count grows
        with the table — a layout fixed at creation eventually leaves each
        bucket too large for a task (or too few buckets to spread across
        the cluster). The rewrite is a single shuffle of the current
        snapshot (deltas are folded on the way through); the exactly-once
        epoch ledger is untouched (``epoch_id: null``), per-bucket LSN
        watermarks are recomputed under the new layout from the rewritten
        rows (provably equal to the old maxima, regrouped — every key's
        stored winner carries the max LSN applied to it), and old snapshots
        keep time-traveling under their own layout because bucket pointers
        are path-based. A ``table_changes`` diff that crosses a rebucket
        boundary sees every pointer changed and falls back to a full-scan
        diff — correct, just unpruned (documented trade).

        Returns ``{seq, n_buckets_before, n_buckets_after, rows}``."""
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        prev = self.last_commit()
        before = self.n_buckets
        if prev is None or not prev["buckets"]:
            # empty table: a pure metadata change
            self.n_buckets = n_buckets
            self._write_props()
            return {
                "seq": prev["seq"] if prev else 0,
                "n_buckets_before": before,
                "n_buckets_after": n_buckets,
                "rows": 0,
            }
        schema = self.current_schema()
        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )
        df = self._read_manifest_buckets(prev, sorted(prev["buckets"]), full)
        new_bucket = F.pmod(F.xxhash64(self.bucket_key), F.lit(n_buckets)).cast("int")
        df = df.withColumn(BUCKET_COL, new_bucket)
        obs = Observation("rebucket")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        seq = prev["seq"] + 1
        commit_dir = f"data/c{seq:08d}"
        abs_dir = os.path.join(self.root, commit_dir)
        salt = F.pmod(F.xxhash64(*self.key_cols), F.lit(WRITE_SALT))
        (
            df.repartition(n_buckets * WRITE_SALT, F.col(BUCKET_COL), salt)
            .sortWithinPartitions(*self.key_cols)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(abs_dir)
        )
        # per-bucket watermarks under the new layout, from the written
        # rows: tombstones included, ≤ n_buckets rows to the driver
        wm_rows = (
            self.spark.read.parquet(abs_dir)
            .withColumn(BUCKET_COL, new_bucket)
            .groupBy(BUCKET_COL)
            .agg(F.max(META_LSN).alias("wm"))
            .collect()
        )
        watermarks = {str(r[0]): int(r[1]) for r in wm_rows}
        buckets = {}
        rstats = (
            self._collect_part_stats(abs_dir, self.current_schema())
            if self.stats_cols
            else {}
        )
        rrows = self._part_rows(abs_dir)
        for d in os.listdir(abs_dir):
            if d.startswith(f"{BUCKET_COL}="):
                b = d.split("=")[1]
                buckets[b] = {
                    "path": f"{commit_dir}/{d}",
                    "schema": prev["schema"],
                    "rows": rrows.get(int(b), 0),
                }
                if int(b) in rstats:
                    buckets[b]["stats"] = rstats[int(b)]
        n_rows = int(obs.get["rows"])
        commit = {
            "seq": seq,
            "epoch_id": None,  # maintenance commit: not an epoch
            "schema": prev["schema"],
            "schema_version": prev["schema_version"],
            "buckets": buckets,
            "watermarks": watermarks,
            "metrics": {
                "maintenance": "rebucket",
                "n_buckets_before": before,
                "n_buckets_after": n_buckets,
                "rows": n_rows,
            },
        }
        self._publish(commit)
        self.n_buckets = n_buckets
        self._write_props()
        return {
            "seq": seq,
            "n_buckets_before": before,
            "n_buckets_after": n_buckets,
            "rows": n_rows,
        }

    def _publish(self, commit: dict) -> None:
        """Atomic commit point: tmp write + rename."""
        seq = commit["seq"]
        d = os.path.join(self.root, "_commits")
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
        with os.fdopen(fd, "w") as fh:
            json.dump(commit, fh)
        os.rename(tmp, os.path.join(d, f"commit-{seq:08d}.json"))

    # ---- schema -----------------------------------------------------

    def current_schema(self) -> T.StructType | None:
        c = self.last_commit()
        if c is None:
            return None
        return self._stored_schema(c["schema"])

    def _stored_schema(self, sname: str) -> T.StructType:
        """Parse one versioned schema file, cached per handle. Schema files
        are immutable (a new version gets a new name), so caching by name
        is safe — same contract as the manifest cache."""
        s = self._schema_cache.get(sname)
        if s is None:
            with open(os.path.join(self.root, "_schema", sname)) as fh:
                s = T.StructType.fromJson(json.load(fh))
            self._schema_cache[sname] = s
        return s

    def _file_schema(self, sname: str) -> T.StructType:
        """The exact physical schema of every data file written under
        stored schema ``sname``: its fields plus the LWW meta columns
        (the bucket is a directory key, never a file column). Passing this
        to ``spark.read.schema(...)`` skips parquet footer schema
        inference — a per-epoch driver cost on the merge's target read
        that grows with the touched buckets' file counts."""
        return T.StructType(
            self._stored_schema(sname).fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )

    def _write_schema(self, schema: T.StructType, version: int) -> str:
        # published atomically (mkstemp + rename, same as _publish): the
        # per-handle schema cache and the inference-free read path depend
        # on a schema file being immutable-and-complete once its name is
        # visible — a fresh reader handle racing this writer must never
        # see a partial file
        name = f"v{version:04d}.json"
        d = os.path.join(self.root, "_schema")
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-schema-")
        with os.fdopen(fd, "w") as fh:
            json.dump(schema.jsonValue(), fh)
        os.rename(tmp, os.path.join(d, name))
        return name

    # ---- read -------------------------------------------------------

    def read_raw(self, at_seq: int | None = None) -> DataFrame:
        """Snapshot including meta columns and tombstones; ``at_seq`` time-
        travels to an older manifest (valid while its data dirs survive
        ``expire_snapshots``)."""
        c = self.commit_at(at_seq) if at_seq is not None else self.last_commit()
        schema = self._stored_schema(c["schema"]) if c is not None else None
        if c is None or not c["buckets"]:
            meta = T.StructType(
                [
                    T.StructField(META_LSN, T.LongType()),
                    T.StructField(META_DELETED, T.BooleanType()),
                    T.StructField(BUCKET_COL, T.IntegerType()),
                ]
            )
            base = schema or T.StructType([])
            return self.spark.createDataFrame([], T.StructType(base.fields + meta.fields))
        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )
        # shared delta-aware reader: old-schema files are cast-aligned, and
        # buckets holding merge-on-read deltas are LWW-folded on the way out
        out = self._read_manifest_buckets(c, sorted(c["buckets"]), full)
        # partitionBy writes the bucket as a directory key; recover it
        return out.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(self.bucket_key), F.lit(self.n_buckets)).cast("int")
        )

    def read(self, at_seq: int | None = None) -> DataFrame:
        """Live rows (tombstones filtered, meta dropped); ``at_seq`` reads
        an older snapshot (time travel)."""
        return (
            self.read_raw(at_seq)
            .where(~F.col(META_DELETED))
            .drop(META_LSN, META_DELETED, BUCKET_COL)
        )

    def _collect_part_stats(self, abs_dir: str, schema: T.StructType) -> dict:
        """Per-bucket min/max of the table's ``stats_cols`` over ONE freshly
        written commit dir (Iceberg's per-file column stats analogue, at
        part granularity). One aggregation job whose scan Catalyst prunes
        to (bucket, stats columns) — O(epoch bytes in those columns), never
        a second pass over the payload. Null-only parts get null bounds
        and are never skipped (conservative)."""
        cols = [c for c in self.stats_cols if c in {f.name for f in schema.fields}]
        if not cols:
            return {}
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        rows = self.spark.read.parquet(abs_dir).groupBy(BUCKET_COL).agg(*aggs).collect()

        def _j(v):
            # JSON-safe bound: timestamps/dates stringify via isoformat
            return v.isoformat() if hasattr(v, "isoformat") else v

        return {
            int(r[BUCKET_COL]): {
                c: [_j(r[f"_lo_{c}"]), _j(r[f"_hi_{c}"])] for c in cols
            }
            for r in rows
        }

    def _with_salt(self, df: DataFrame, salts: dict[int, int]) -> DataFrame:
        """Add ``_salt`` = pmod(xxhash64(key), per-bucket fan-out). Rows
        whose bucket is unprobed (null-lsn) get a null salt: they still
        hash to a stable partition and write into their bucket dir.

        Small maps inline as a literal ``create_map`` lookup (no extra plan
        node); wide epochs (hundreds+ touched buckets) switch to a broadcast
        hash join — the literal-map lookup is a linear scan per row."""
        if len(salts) <= SALT_MAP_LITERAL_MAX:
            fanout = F.element_at(
                F.create_map(
                    *[F.lit(x) for b, s in sorted(salts.items()) for x in (b, s)]
                ),
                F.col(BUCKET_COL),
            )
        else:
            smap = self.spark.createDataFrame(
                sorted(salts.items()), f"{BUCKET_COL} int, _fanout int"
            )
            df = df.join(F.broadcast(smap), BUCKET_COL, "left")
            fanout = F.col("_fanout")
        return df.withColumn(
            "_salt", F.pmod(F.xxhash64(*self.key_cols), fanout)
        ).drop("_fanout")

    @staticmethod
    def _part_rows(abs_dir: str) -> dict[int, int]:
        """Per-bucket row counts of one freshly written commit dir, read
        from the parquet footers — driver-side, no Spark job (the Iceberg
        manifest row-count analogue). Sizes the NEXT epoch's adaptive write
        salt; a missing/unreadable footer degrades to 0 (salt sized by the
        batch alone), never fails the commit."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def _n(path: str) -> int:
            try:
                return pq.ParquetFile(path).metadata.num_rows
            except Exception:
                return 0

        by_bucket: dict[int, list[str]] = {}
        for d in os.listdir(abs_dir):
            if not d.startswith(f"{BUCKET_COL}="):
                continue
            bdir = os.path.join(abs_dir, d)
            by_bucket[int(d.split("=")[1])] = [
                os.path.join(bdir, f)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            ]
        files = [p for paths in by_bucket.values() for p in paths]
        # footer opens release the GIL in pyarrow's C++ IO; a small pool
        # turns a salt-fanned epoch's serial footer walk into one round-trip
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(files)))) as pool:
            counts = dict(zip(files, pool.map(_n, files)))
        return {b: sum(counts[p] for p in paths) for b, paths in by_bucket.items()}

    def read_where(
        self, predicates: dict[str, tuple], at_seq: int | None = None
    ) -> DataFrame:
        """Stats-pruned snapshot read: ``predicates`` maps a stats column
        to an inclusive ``(lo, hi)`` range (either end may be None). A
        bucket is SKIPPED — its files never open — when, for some
        predicate column, EVERY part of the bucket carries stats whose
        range is disjoint from the predicate's.

        Whole-bucket granularity is what makes this safe under
        merge-on-read: pruning an individual delta part could resurrect a
        superseded row version, but if every part of a bucket is out of
        range then every key's LATEST version is out of range and the
        bucket contributes nothing to the filtered result. The surviving
        buckets are read normally (LWW fold included) and the same range
        filter is applied row-level, where it also pushes down to the
        parquet scan — stats pruning only removes whole file sets the scan
        would otherwise have to open."""
        c = self.commit_at(at_seq) if at_seq is not None else self.last_commit()
        if c is None:
            return self.read(at_seq)

        def _norm(v):
            # same JSON-safe normalization the stats writer used; ISO-8601
            # strings order chronologically, so string comparison is sound
            return v.isoformat() if hasattr(v, "isoformat") else v

        def _disjoint(stats: dict, col: str, lo, hi) -> bool:
            b = stats.get(col)
            if not b or b[0] is None or b[1] is None:
                return False  # no/NULL stats: never skip (conservative)
            plo, phi = b
            lo, hi = _norm(lo), _norm(hi)
            return (hi is not None and plo > hi) or (lo is not None and phi < lo)

        keep = []
        for b, ptr in c["buckets"].items():
            parts = self._ptr_parts(ptr)
            skip = any(
                all(_disjoint(part.get("stats", {}), col, lo, hi) for part in parts)
                for col, (lo, hi) in predicates.items()
            )
            if not skip:
                keep.append(b)

        with open(os.path.join(self.root, "_schema", c["schema"])) as fh:
            schema = T.StructType.fromJson(json.load(fh))
        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )
        out = self._read_manifest_buckets(c, sorted(keep), full)
        out = out.where(~F.col(META_DELETED)).drop(META_LSN, META_DELETED)
        for col, (lo, hi) in predicates.items():
            if lo is not None:
                out = out.where(F.col(col) >= lo)
            if hi is not None:
                out = out.where(F.col(col) <= hi)
        return out

    @staticmethod
    def _ptr_parts(ptr: dict) -> list[dict]:
        """All file-set parts a bucket pointer references: the base file
        set plus any merge-on-read delta file sets (each carries the schema
        version its files were written under, and its column stats when the
        table records them)."""
        base = {k: ptr[k] for k in ("path", "schema", "stats", "rows") if k in ptr}
        return [base] + list(ptr.get("deltas", []))

    def _lww_fold(self, df: DataFrame, full: T.StructType) -> DataFrame:
        """Resolve multi-version rows (base + MoR deltas) to one winner per
        merge key with the SAME payload/order expressions the CoW merge
        aggregation uses — staged folds and the single-pass merge provably
        agree (see ``lww_payload_order``). Partial+final aggregation,
        map-side combine; the shuffle covers only the rows handed in
        (delta-holding buckets), never the whole table."""
        non_key = [
            f.name
            for f in full.fields
            if f.name not in self.key_cols and f.name not in (META_LSN, META_DELETED)
        ]
        payload, order = lww_payload_order(non_key)
        agg = df.groupBy(*self.key_cols).agg(F.max_by(payload, order).alias("_w"))
        return agg.select(
            *self.key_cols,
            *[F.col(f"_w.{c}").alias(c) for c in non_key],
            F.col(f"_w.{META_LSN}").alias(META_LSN),
            F.col(f"_w.{META_DELETED}").alias(META_DELETED),
        ).select(*[F.col(f.name) for f in full.fields])

    def _read_manifest_buckets(
        self, c: dict, bucket_ids: list[str], full: T.StructType
    ) -> DataFrame:
        """Rows of the listed bucket pointers of manifest ``c``, aligned to
        ``full`` (old-schema files read with their own schema, then cast).

        Buckets carrying merge-on-read deltas are LWW-folded here — the
        read-side half of the MoR contract — while delta-free buckets pass
        through with no shuffle at all. The fold's groupBy keys on the
        merge key, whose bucket hash is a function of the bucket key, so a
        row never crosses bucket boundaries during the fold."""
        plain: dict[str, list[str]] = {}
        delta: dict[str, list[str]] = {}
        for b in bucket_ids:
            ptr = c["buckets"].get(b)
            if ptr is None:
                continue
            dest = delta if ptr.get("deltas") else plain
            for part in self._ptr_parts(ptr):
                p = os.path.join(self.root, part["path"])
                if not os.path.exists(p):
                    raise ValueError(
                        f"snapshot references expired data ({part['path']}); "
                        "it was reclaimed by expire_snapshots"
                    )
                dest.setdefault(part["schema"], []).append(p)

        def _union(by_schema: dict[str, list[str]]) -> DataFrame | None:
            # explicit per-version file schema: no footer inference pass
            parts = [
                align(self.spark.read.schema(self._file_schema(sname)).parquet(*paths), full)
                for sname, paths in by_schema.items()
            ]
            if not parts:
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        out = _union(plain)
        d = _union(delta)
        if d is not None:
            d = self._lww_fold(d, full)
            out = d if out is None else out.unionByName(d)
        if out is None:
            return self.spark.createDataFrame([], full)
        return out

    def table_changes(
        self,
        from_seq: int,
        to_seq: int | None = None,
        images: str = "post",
    ) -> DataFrame:
        """Changelog read (Iceberg CDF / ``table_changes`` analogue): the
        NET row-level delta between committed snapshot ``from_seq`` and
        ``to_seq`` (default: current head) — what a downstream incremental
        consumer must apply to go from one snapshot to the other without
        replaying the change stream. One row per key whose live image
        differs: ``change_type`` insert/update/delete, the post-image for
        inserts/updates, the pre-image for deletes, and the winning
        writer's LSN from the target snapshot.

        ``from_seq=0`` diffs against the empty table (a bootstrap read:
        every live row is an insert).

        ``images="post"`` (default) emits the single relevant image as flat
        columns; ``images="both"`` emits ``pre`` and ``post`` row-image
        structs (NULL pre on insert, NULL post on delete) — the contract
        incremental aggregate maintenance consumes (operators/
        incremental_rollup.py).

        Scale shape: the manifests are diffed first and only buckets whose
        pointer CHANGED between the two snapshots are read on either side —
        an untouched bucket is inherited by pointer, so it provably holds
        identical rows and is pruned without touching its files. The diff
        join therefore scans and shuffles O(changed buckets), not O(table);
        both sides are hash-bucketed identically on the merge key, so the
        full-outer join's shuffle is the same partitioning the merge itself
        uses. Tombstones are retained by the merge (module doc), so deletes
        remain visible to any later ``from_seq``."""
        c_to = self.commit_at(to_seq) if to_seq is not None else self.last_commit()
        if c_to is None:
            raise ValueError("table has no commits")
        if from_seq == 0:
            c_from: dict = {"buckets": {}}
        else:
            c_from = self.commit_at(from_seq)
        with open(os.path.join(self.root, "_schema", c_to["schema"])) as fh:
            schema = T.StructType.fromJson(json.load(fh))
        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )
        changed = sorted(
            b
            for b in set(c_from["buckets"]) | set(c_to["buckets"])
            if c_from["buckets"].get(b) != c_to["buckets"].get(b)
        )
        old = self._read_manifest_buckets(c_from, changed, full)
        new = self._read_manifest_buckets(c_to, changed, full)
        data_cols = [f.name for f in schema.fields if f.name not in self.key_cols]
        o = old.select(
            *self.key_cols,
            F.struct(*[F.col(c) for c in data_cols]).alias("_oimg"),
            F.col(META_LSN).alias("_olsn"),
            F.col(META_DELETED).alias("_odel"),
        )
        n = new.select(
            *self.key_cols,
            F.struct(*[F.col(c) for c in data_cols]).alias("_nimg"),
            F.col(META_LSN).alias("_nlsn"),
            F.col(META_DELETED).alias("_ndel"),
        )
        j = o.join(n, self.key_cols, "full_outer")
        old_live = F.col("_olsn").isNotNull() & ~F.coalesce("_odel", F.lit(False))
        new_live = F.col("_nlsn").isNotNull() & ~F.coalesce("_ndel", F.lit(False))
        ct = (
            F.when(~old_live & new_live, F.lit("insert"))
            .when(old_live & ~new_live, F.lit("delete"))
            .when(old_live & new_live & (F.col("_nlsn") > F.col("_olsn")), F.lit("update"))
        )
        j = j.withColumn("change_type", ct).where(F.col("change_type").isNotNull())
        if images == "both":
            # pre+post row images (Delta CDF's update_preimage/postimage,
            # folded into one row) — what algebraic downstream maintenance
            # (incremental_rollup) needs to retract the old contribution
            # and add the new one in a single pass.
            live_pre = F.when(old_live, F.col("_oimg"))
            live_post = F.when(new_live, F.col("_nimg"))
            return j.select(
                *self.key_cols,
                F.col("change_type"),
                F.col("_nlsn").alias("lsn"),
                live_pre.alias("pre"),
                live_post.alias("post"),
            )
        img = F.when(F.col("change_type") == "delete", F.col("_oimg")).otherwise(
            F.col("_nimg")
        )
        return j.select(
            *self.key_cols,
            F.col("change_type"),
            F.col("_nlsn").alias("lsn"),
            *[img.getField(c).alias(c) for c in data_cols],
        )

    # ---- merge ------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(self.bucket_key), F.lit(self.n_buckets)).cast("int")

    def probe_batch(
        self, pdf: DataFrame, lsn_col: str = "lsn"
    ) -> dict[int, tuple[int, int]]:
        """The touched-bucket / watermark probe as a standalone action:
        ``{bucket: (max_lsn, n_rows)}`` over a two-column projection of the
        batch (≤ n_buckets rows to the driver). Exposed so a replay loop
        can PREFETCH the next epoch's probe on a separate thread while the
        current epoch's merge job runs — the probe must finish before the
        merge plan can be built (it sizes the adaptive write salt and picks
        the target buckets to read), so off the critical path it stops
        costing a serialized job per epoch (runner.apply_epochs does this).

        Null-lsn rows are dropped defensively: a row whose watermark can't
        be computed must never mark a bucket touched nor produce a None
        watermark (int(None) would fail after the data write, before the
        commit — deterministically on every retry)."""
        return {
            r[0]: (r[1], r[2])
            for r in pdf.where(F.col(lsn_col).isNotNull())
            .select(
                self._bucket_expr().alias(BUCKET_COL),
                F.col(lsn_col).cast("long").alias(META_LSN),
            )
            .groupBy(BUCKET_COL)
            .agg(F.max(META_LSN), F.count(F.lit(1)))
            .collect()
        }

    def probe_epochs(
        self, pdf: DataFrame, epoch_col: str = "epoch_id", lsn_col: str = "lsn"
    ) -> dict[int, dict[int, tuple[int, int]]]:
        """Every epoch's touched-bucket/watermark probe in ONE grouped job:
        ``{epoch: {bucket: (max_lsn, n_rows)}}``. A replay loop that knows
        its epochs up front (``runner.apply_epochs``) pays one probe-job
        latency for the whole replay instead of one per epoch — the scan
        is the same two-column projection as ``probe_batch`` over all
        epochs at once (columnar, epoch-partition-pruned source), and the
        driver receives ≤ epochs × n_buckets tiny rows. Null-lsn rows are
        dropped for the same reasons as ``probe_batch``."""
        out: dict[int, dict[int, tuple[int, int]]] = {}
        rows = (
            pdf.where(F.col(lsn_col).isNotNull())
            .select(
                F.col(epoch_col).cast("long").alias("_e"),
                self._bucket_expr().alias(BUCKET_COL),
                F.col(lsn_col).cast("long").alias(META_LSN),
            )
            .groupBy("_e", BUCKET_COL)
            .agg(F.max(META_LSN), F.count(F.lit(1)))
            .collect()
        )
        for r in rows:
            out.setdefault(int(r[0]), {})[r[1]] = (r[2], r[3])
        return out

    def merge_into(
        self,
        src: DataFrame,
        epoch_id: int,
        lsn_col: str = "lsn",
        op_col: str = "op",
        probe_src: DataFrame | None = None,
        mode: str = "cow",
        lww: str = "window",
        probe: dict[int, tuple[int, int]] | None = None,
    ) -> MergeMetrics:
        """MERGE src (one epoch's change events, may contain intra-batch
        duplicates) into the table under max-LSN LWW. Idempotent per epoch.

        ``probe_src``: optional cheaper stand-in for the touched-bucket /
        watermark probe — must contain the same (bucket-key, lsn) rows as
        ``src`` (e.g. the pre-enrichment batch, so the probe pass does not
        re-run an expensive UDF stage). ``probe``: the probe RESULT itself
        (from ``probe_batch`` over the same rows), when the caller already
        ran it — e.g. prefetched concurrently with the previous epoch's
        merge; passing it skips the probe job entirely. CONTRACT: a passed
        probe must be ``probe_batch`` over the exact post-filter rows of a
        deterministic source — the merge validates that every bucket it
        writes was probe-touched and aborts before commit otherwise (a
        silent miss would drop the untouched bucket's existing rows).

        ``mode``:

        * ``"cow"`` (default) — copy-on-write: touched buckets are read,
          merged, and rewritten wholesale. Read-optimal (one version per
          key on disk), but write amplification is O(bucket size) per
          epoch: at 10^10 events with small, frequent epochs the merge
          rewrites far more bytes than it ingests.
        * ``"mor"`` — merge-on-read (Iceberg equality-delete analogue, the
          shape Flink CDC writes): the epoch's rows are LWW-deduped
          *within the batch only* and appended as per-bucket DELTA file
          sets — the target is never read, so bytes written per epoch is
          O(batch), not O(touched buckets). Readers fold base+deltas with
          the same LWW expressions (``_read_manifest_buckets``), and
          ``compact()`` folds deltas back into one base file per bucket.
          Because the target is unread, per-epoch updated/inserted/
          deleted/stale conflict counts are unknowable at write time and
          reported as -1 (Iceberg MoR has the same limitation); the
          authoritative counts come from ``table_changes`` or compaction.

        Modes may be mixed freely on one table: a CoW merge on a bucket
        carrying deltas reads every part and retires them.

        Equivalent Iceberg statement (SURVEY §4.3):
            MERGE INTO tgt USING src ON tgt.conv_id=src.conv_id AND tgt.turn_idx=src.turn_idx
            WHEN MATCHED AND src.lsn > tgt.lsn AND src.op='D' THEN UPDATE SET _deleted=true ...
            WHEN MATCHED AND src.lsn > tgt.lsn THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        (tombstones retained instead of DELETE so late lower-LSN events lose).
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge mode {mode!r} (use 'cow' or 'mor')")
        if lww not in ("window", "agg"):
            raise ValueError(f"unknown lww strategy {lww!r} (use 'window' or 'agg')")
        t0 = time.time()
        if epoch_id in self.committed_epochs():
            return MergeMetrics(epoch_id=epoch_id, skipped=True)

        prev = self.last_commit()
        data_cols = [c for c in src.columns if c not in (lsn_col, op_col, "epoch_id")]
        incoming = T.StructType([f for f in src.schema.fields if f.name in data_cols])
        current = self.current_schema()
        if current is None:
            schema, schema_changed = incoming, True
            version = 1
        else:
            schema, schema_changed = evolve_schema(current, incoming)
            version = (prev["schema_version"] + 1) if schema_changed else prev["schema_version"]
        schema_name = self._write_schema(schema, version) if schema_changed else prev["schema"]

        have = {f.name for f in src.schema.fields}
        src_rows = src.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ],
            F.col(lsn_col).cast("long").alias(META_LSN),
            (F.col(op_col) == "D").alias(META_DELETED),
        ).withColumn(BUCKET_COL, self._bucket_expr())

        # Probe job: touched buckets, per-bucket source LSN maxima, and
        # per-bucket batch row counts (≤ n_buckets rows to the driver). Runs
        # on a two-column projection of the (pre-enrichment, when provided)
        # batch — Catalyst prunes the scan to the probe's columns, so this
        # pass is much cheaper than materializing the full batch, and the
        # merge job below reads the source through its own (columnar,
        # cached-by-OS) scan. The counts size the adaptive write salt below.
        t_probe = time.time()
        if probe is None:
            probe = self.probe_batch(
                probe_src if probe_src is not None else src, lsn_col
            )
        touched = sorted(probe)
        t_probe = time.time() - t_probe
        if not touched:
            seq = (prev["seq"] + 1) if prev else 1
            commit = {
                "seq": seq,
                "epoch_id": epoch_id,
                "schema": schema_name,
                "schema_version": version,
                "buckets": prev["buckets"] if prev else {},
                "watermarks": prev.get("watermarks", {}) if prev else {},
                "metrics": MergeMetrics(epoch_id=epoch_id).as_dict(),
            }
            self._publish(commit)
            return MergeMetrics(epoch_id=epoch_id)

        full = T.StructType(
            schema.fields
            + [
                T.StructField(META_LSN, T.LongType()),
                T.StructField(META_DELETED, T.BooleanType()),
            ]
        )
        # a delta write only makes sense against an existing table; a first
        # merge degenerates to the (identical) single-pass path below
        mor_delta = mode == "mor" and prev is not None
        tgt_parts = []
        if prev and not mor_delta:
            by_schema: dict[str, list[str]] = {}
            for b in touched:
                ptr = prev["buckets"].get(str(b))
                if ptr:
                    # every part: base + any merge-on-read deltas — the LWW
                    # aggregation below resolves them and the rewrite
                    # retires the delta pointers for the touched buckets
                    for part in self._ptr_parts(ptr):
                        by_schema.setdefault(part["schema"], []).append(
                            os.path.join(self.root, part["path"])
                        )
            for sname, paths in by_schema.items():
                # explicit schema: the merge's target read otherwise pays a
                # footer schema-inference pass per epoch (driver-side, scales
                # with touched buckets × salt files — pure fixed cost)
                df = self.spark.read.schema(self._file_schema(sname)).parquet(*paths)
                tgt_parts.append(
                    align(df, full).withColumn(BUCKET_COL, self._bucket_expr())
                )

        src_tagged = src_rows.withColumn("_src", F.lit(True))
        merged = src_tagged
        for p in tgt_parts:
            merged = merged.unionByName(p.withColumn("_src", F.lit(False)))

        non_key = [f.name for f in schema.fields if f.name not in self.key_cols]
        # LWW resolution — the same total order (lww_payload_order, shared
        # with the MoR read fold so staged folds agree with single-pass
        # merges) executed by one of two physical strategies; see the module
        # docstring for the full trade-off.
        payload, order = lww_payload_order(non_key)
        # ADAPTIVE write salting: a mega-conversation concentrates in one
        # bucket; a one-task-per-bucket layout would serialize it and cap
        # scaling at any core count (SURVEY §4.2 #1). Hash-salting on the
        # full key splits a hot bucket across tasks/files — but a FIXED salt
        # multiplies the file count of every cold bucket too (at 4096
        # buckets × salt 8 that is 32k files per epoch, most of them tiny).
        # Instead each touched bucket gets its own salt sized from the rows
        # it will write: the batch's per-bucket counts (probe job, already
        # paid) plus the target rows the CoW rewrite re-emits (per-part
        # "rows" recorded in the manifest at write time — the Iceberg
        # manifest row-count analogue; absent on pre-upgrade manifests ⇒
        # sized by batch only). Layout stays deterministic (salt counts are
        # a function of probe + manifest, content-hash partitioning), and
        # readers are layout-agnostic (they list the bucket directory).
        prev_rows = {}
        if prev and not mor_delta:
            for b in touched:
                ptr = prev["buckets"].get(str(b))
                if ptr:
                    prev_rows[b] = sum(
                        int(part.get("rows", 0)) for part in self._ptr_parts(ptr)
                    )
        salts = {
            b: min(
                MAX_WRITE_SALT,
                max(1, -(-(n + prev_rows.get(b, 0)) // ROWS_PER_WRITE_TASK)),
            )
            for b, (_m, n) in probe.items()
        }
        n_parts = max(1, sum(salts.values()))
        if lww == "window":
            # One shuffle, straight into the write layout: hash partitioning
            # on (bucket, salt) clusters every key (both are functions of
            # the key columns), which satisfies the window's required
            # distribution over (bucket, salt, *key) — Spark adds only the
            # in-partition sort, no second exchange, and the parquet write
            # below inherits the layout unchanged. row_number()==1 over the
            # LWW order descending is argmax(order), i.e. exactly the
            # max_by winner; the flag aggregates ride the same sorted frame.
            part = self._with_salt(merged, salts).repartition(
                n_parts, F.col(BUCKET_COL), F.col("_salt")
            )
            w = Window.partitionBy(BUCKET_COL, "_salt", *self.key_cols).orderBy(
                F.desc(order)
            )
            wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            out = (
                part.select(
                    *self.key_cols,
                    F.col(BUCKET_COL),
                    *[F.col(c) for c in non_key],
                    F.col(META_LSN),
                    F.col(META_DELETED),
                    F.row_number().over(w).alias("_rn"),
                    F.max(F.when(F.col("_src"), F.col(META_LSN))).over(wf).alias("_src_lsn"),
                    F.max(F.when(~F.col("_src"), F.col(META_LSN))).over(wf).alias("_tgt_lsn"),
                    F.max(F.when(~F.col("_src"), F.col(META_DELETED))).over(wf).alias("_tgt_deleted"),
                )
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            # max_by(payload, order) partial+final aggregation: map-side
            # combine folds per-key duplicate storms before the shuffle
            # (then a second exchange lays the result out for the write).
            winner = F.max_by(payload, order).alias("_w")
            flags = [
                F.max(F.when(F.col("_src"), F.col(META_LSN))).alias("_src_lsn"),
                F.max(F.when(~F.col("_src"), F.col(META_LSN))).alias("_tgt_lsn"),
                F.max(F.when(~F.col("_src"), F.col(META_DELETED))).alias("_tgt_deleted"),
            ]
            agg = merged.groupBy(*self.key_cols, BUCKET_COL).agg(winner, *flags)

            out = agg.select(
                *self.key_cols,
                F.col(BUCKET_COL),
                *[F.col(f"_w.{c}").alias(c) for c in non_key],
                F.col(f"_w.{META_LSN}").alias(META_LSN),
                F.col(f"_w.{META_DELETED}").alias(META_DELETED),
                F.col("_src_lsn"),
                F.col("_tgt_lsn"),
                F.col("_tgt_deleted"),
            )

        obs = Observation(f"merge-{epoch_id}")
        if mor_delta:
            # target unread → conflict classification impossible at write
            # time; observe only the delta cardinality (metrics report -1)
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("rows_applied"),
                F.max(F.col(META_LSN)).alias("max_lsn"),
            )
        else:
            src_won = F.col("_src_lsn").isNotNull() & (
                F.col("_tgt_lsn").isNull() | (F.col("_src_lsn") > F.col("_tgt_lsn"))
            )
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("rows_applied"),
                F.sum(
                    (
                        src_won & F.col("_tgt_lsn").isNotNull() & ~F.col(META_DELETED)
                    ).cast("long")
                ).alias("updated"),
                F.sum((src_won & F.col("_tgt_lsn").isNull() & ~F.col(META_DELETED)).cast("long")).alias(
                    "inserted"
                ),
                F.sum((src_won & F.col(META_DELETED) & ~F.coalesce(F.col("_tgt_deleted"), F.lit(False))).cast("long")).alias("deleted"),
                F.sum(
                    (
                        F.col("_src_lsn").isNotNull()
                        & F.col("_tgt_lsn").isNotNull()
                        & (F.col("_src_lsn") < F.col("_tgt_lsn"))
                    ).cast("long")
                ).alias("stale"),
                F.max(F.col(META_LSN)).alias("max_lsn"),
            )
        final_cols = (
            [F.col(f.name) for f in schema.fields]
            + [F.col(META_LSN), F.col(META_DELETED), F.col(BUCKET_COL)]
        )
        out = out.select(*final_cols)

        seq = (prev["seq"] + 1) if prev else 1
        commit_dir = f"data/c{seq:08d}"
        abs_dir = os.path.join(self.root, commit_dir)
        t_write = time.time()
        writer = out
        if lww == "agg":
            # the agg output is distributed by the grouping hash; lay it out
            # by (bucket, salt) for the write. (The window strategy already
            # produced exactly this layout, sorted by key — T3 stable
            # in-partition order — so it writes as-is with no exchange.)
            writer = (
                self._with_salt(out, salts)
                .repartition(n_parts, F.col(BUCKET_COL), F.col("_salt"))
                .sortWithinPartitions(*self.key_cols)
                .drop("_salt")
            )
        (
            writer.write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(abs_dir)
        )
        t_write = time.time() - t_write
        m = obs.get

        # per-bucket LSN watermarks for lineage/resume metrics: a touched
        # bucket's new watermark is max(previous watermark, batch maximum) —
        # derived from the probe job, no extra pass over the written files
        new_watermarks = dict(prev.get("watermarks", {})) if prev else {}
        for b, (src_max, _n) in probe.items():
            cur = new_watermarks.get(str(b))
            new_watermarks[str(b)] = max(int(src_max), int(cur)) if cur is not None else int(src_max)

        buckets = dict(prev["buckets"]) if prev else {}
        present = {
            int(d.split("=")[1])
            for d in os.listdir(abs_dir)
            if d.startswith(f"{BUCKET_COL}=")
        }
        # Probe-contract guard: every bucket this merge actually wrote must
        # have been probe-touched. A caller-supplied ``probe`` that misses a
        # written bucket (stale prefetch, probe over different rows, a
        # non-deterministic source re-evaluated between probe and merge)
        # would otherwise silently replace that bucket's pointer with a
        # batch-only fold — permanently dropping its existing rows (CoW) or
        # KeyError-ing on the watermark below. Abort BEFORE _publish: the
        # orphaned data dir is retired by expire_snapshots, the table is
        # untouched.
        unprobed = present - {int(b) for b in probe}
        if unprobed:
            raise RuntimeError(
                f"merge wrote buckets {sorted(unprobed)} the probe never "
                "touched — the probe must come from probe_batch over the "
                "exact post-filter rows of a deterministic source "
                "(epoch not committed)"
            )
        part_stats = self._collect_part_stats(abs_dir, schema) if self.stats_cols else {}
        part_rows = self._part_rows(abs_dir)
        for b in present:
            part = {
                "path": f"{commit_dir}/{BUCKET_COL}={b}",
                "schema": schema_name,
                "rows": part_rows.get(b, 0),
            }
            if b in part_stats:
                part["stats"] = part_stats[b]
            if mor_delta and str(b) in buckets:
                # append a delta file set; the base pointer (and any earlier
                # deltas) stay — readers fold, compact() retires
                ptr = dict(buckets[str(b)])
                ptr["deltas"] = list(ptr.get("deltas", [])) + [part]
                buckets[str(b)] = ptr
            else:
                # CoW rewrite, or first data for this bucket (a fold of the
                # batch alone IS the merged state when there is no base)
                buckets[str(b)] = part

        metrics = MergeMetrics(
            epoch_id=epoch_id,
            mode=mode,
            rows_in_batch=-1,  # caller may fill; avoiding an extra count job
            keys_in_batch=-1,
            rows_applied=int(m["rows_applied"]),
            updated=int(m["updated"] or 0) if not mor_delta else -1,
            inserted=int(m["inserted"] or 0) if not mor_delta else -1,
            deleted=int(m["deleted"] or 0) if not mor_delta else -1,
            stale=int(m["stale"] or 0) if not mor_delta else -1,
            buckets_touched=len(present),
            lsn_watermarks={str(b): new_watermarks[str(b)] for b in present},
            wall_sec=time.time() - t0,
            probe_sec=round(t_probe, 3),
            write_sec=round(t_write, 3),
        )
        commit = {
            "seq": seq,
            "epoch_id": epoch_id,
            "schema": schema_name,
            "schema_version": version,
            "buckets": buckets,
            "watermarks": new_watermarks,
            "metrics": metrics.as_dict(),
        }
        self._publish(commit)
        return metrics
