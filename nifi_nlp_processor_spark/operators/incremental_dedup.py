"""Incremental near-duplicate dedup: new document batches checked against
a PERSISTED fingerprint index of everything seen before.

The batch pipeline (``lsh_candidate_pairs`` → ``jaccard_pairs``) answers
"which docs in this corpus are near-dups of each other" — but a training-
data ingest never sees the corpus at once: crawls arrive in batches, and
re-sketching 100 TB of history per batch is the anti-pattern this module
exists to avoid. The index persists exactly two relations per document,
both tiny next to the text:

* ``buckets``  — (doc_id, band, bucket): the LSH banding of the MinHash
  signature. Parquet partitioned by ``band``; at cluster scale this is
  additionally bucketed by ``bucket`` so the candidate probe is a
  co-partitioned join that touches only the new batch's bucket values.
* ``shingles`` — (doc_id, shingle-hash): the exact-verify side. Only ever
  read semi-joined down to candidate doc ids (the ``jaccard_pairs``
  candidate restriction), so a batch's verify cost is O(candidates), not
  O(history).

**Drop policy — greedy against history.** A new doc is dropped iff it
shares an LSH bucket AND passes exact Jaccard ≥ threshold with ANY
earlier-id document already processed (kept or dropped) or any
earlier-id document of its own batch. Indexing dropped docs too makes
the outcome *batch-split invariant*: the kept set equals the full-batch
rule "drop b iff ∃ a < b with (a,b) a verified near-dup pair", no matter
how the stream was chunked (proven in tests/test_incremental_dedup.py by
comparing 1-, 2- and 5-batch splits). Deduping against kept docs only
would couple each batch's outcome to every earlier verdict, making the
result depend on chunking — a silent nondeterminism at ingest time.
(Greedy-by-id differs from connected-component canonicalization when
near-dup is non-transitive; CC remains the batch-mode consume path,
``connected_components``.)

Batches must arrive in ascending doc-id ranges (a monotone ingest key —
the CDC LSN analogue); ``process_batch`` validates this against the
persisted high-water mark.

Commit protocol: each batch's index appends land under
``root/{buckets,shingles}/batch=<n>`` directories, made visible by a
meta-file rename AFTER both writes (the lake's manifest pattern in
miniature) — a crashed half-written batch is invisible on restart and
the batch re-runs idempotently.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.doc_dedup import (
    jaccard_pairs,
    lsh_buckets,
    minhash_signatures,
    shingles,
)


class NearDupIndex:
    """Persisted LSH fingerprint index with greedy-against-history dedup.

    Parameters are frozen into ``_index.json`` on first use; reopening the
    root adopts them (mixed-parameter fingerprints would silently break
    bucket agreement, the same failure mode as changing a hash function
    mid-table)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        k: int = 3,
        num_hashes: int = 8,
        bands: int = 4,
        min_jaccard: float = 0.5,
        hash_fn: str = "xxhash64",
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.root = root
        meta_path = os.path.join(root, "_index.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            self.params = meta["params"]
            self.batches = meta["batches"]
            self.max_id = meta["max_id"]
        else:
            os.makedirs(root, exist_ok=True)
            self.params = {
                "k": k,
                "num_hashes": num_hashes,
                "bands": bands,
                "min_jaccard": min_jaccard,
                "hash_fn": hash_fn,
                "id_col": id_col,
                "text_col": text_col,
            }
            self.batches: list[int] = []
            self.max_id: int | None = None
            self._write_meta()

    def _write_meta(self) -> None:
        tmp = os.path.join(self.root, "_index.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {"params": self.params, "batches": self.batches, "max_id": self.max_id},
                fh,
            )
        os.rename(tmp, os.path.join(self.root, "_index.json"))

    def _committed(self, kind: str) -> list[str]:
        return [
            os.path.join(self.root, kind, f"batch={b}") for b in self.batches
        ]

    def _read_index(self, kind: str, schema: str) -> DataFrame:
        paths = self._committed(kind)
        if not paths:
            return self.spark.createDataFrame([], schema)
        # basePath anchors partition discovery at the index root, so
        # multiple batch=N dirs (with band=M dirs nested under buckets/)
        # resolve as ONE partitioned relation instead of conflicting roots;
        # listing only committed batch dirs is the commit-protocol filter
        # (an uncommitted half-written batch dir is simply never listed).
        df = self.spark.read.option("basePath", os.path.join(self.root, kind)).parquet(
            *paths
        )
        return df.drop("batch")

    # ------------------------------------------------------------------
    def process_batch(self, docs: DataFrame) -> DataFrame:
        """Dedupe one batch against the index + itself; returns the KEPT
        rows of ``docs`` (full width) and appends the whole batch's
        fingerprints to the index.

        Plan shape: the history probe joins the new batch's (band, bucket)
        keys against the persisted bucket relation — with partitioned
        storage only matching partitions are scanned; history shingles are
        read candidate-restricted inside ``jaccard_pairs``. Nothing
        re-sketches history, and the new batch's text is scanned once
        (shingle derivation), not collected.

        Laziness contract: only the dropped-id VERDICT is materialized
        (checkpointed) before the index append; the returned ``kept``
        DataFrame stays LAZY — each downstream action re-reads ``docs``
        post-commit. ``docs`` must therefore be a stable, deterministic
        source (a table/files, not a non-deterministic derivation), and
        callers acting on the result more than once should persist it —
        otherwise a mutated source could yield kept rows inconsistent with
        the fingerprints this call committed."""
        p = self.params
        id_col, text_col = p["id_col"], p["text_col"]

        lo = docs.agg(F.min(id_col), F.max(id_col)).first()
        if lo[0] is None:
            return docs  # empty batch
        if self.max_id is not None and lo[0] <= self.max_id:
            raise ValueError(
                f"batch id range [{lo[0]}, {lo[1]}] overlaps the index "
                f"high-water mark {self.max_id}; batches must arrive in "
                "ascending id ranges"
            )

        sh_new = shingles(
            docs.select(id_col, text_col), k=p["k"], id_col=id_col, text_col=text_col
        ).persist()
        sig = minhash_signatures(
            sh_new, num_hashes=p["num_hashes"], id_col=id_col, hash_fn=p["hash_fn"]
        )
        bk_new = lsh_buckets(
            sig,
            bands=p["bands"],
            id_col=id_col,
            bucket_fn="xxhash64" if p["hash_fn"] == "xxhash64" else "concat",
        ).persist()

        bucket_t = dict(bk_new.dtypes)["bucket"]
        sh_hist = self._read_index("shingles", f"{id_col} long, shingle string")
        bk_hist = self._read_index(
            "buckets", f"{id_col} long, band int, bucket {bucket_t}"
        )

        # candidates: (history, new) via the bucket probe + (new, new)
        # within-batch; a_id < b_id always orients old → new.
        hist_new = (
            bk_hist.select(F.col(id_col).alias("a_id"), "band", "bucket")
            .join(bk_new.select(F.col(id_col).alias("b_id"), "band", "bucket"),
                  ["band", "bucket"])
            .select("a_id", "b_id")
            .distinct()
        )
        nn = (
            bk_new.select(F.col(id_col).alias("a_id"), "band", "bucket")
            .join(bk_new.select(F.col(id_col).alias("b_id"), "band", "bucket"),
                  ["band", "bucket"])
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
        )
        cand = hist_new.unionByName(nn).distinct()

        all_sh = sh_hist.unionByName(
            sh_new.select(F.col(id_col).cast("long").alias(id_col), "shingle")
        )
        dups = jaccard_pairs(
            all_sh, min_jaccard=p["min_jaccard"], id_col=id_col, candidates=cand
        )
        dropped = dups.select(F.col("b_id").alias(id_col)).distinct()
        # materialize the VERDICT (dropped ids) BEFORE appending the index,
        # so the verify provably ran against the pre-batch index state and a
        # failure leaves no half-visible batch. Checkpointing only the id
        # set keeps the pre-append barrier at O(dropped) memory — the
        # earlier full-width kept-rows checkpoint was O(batch), which at
        # ingest scale pins the whole batch's text in executor storage.
        dropped = dropped.localCheckpoint(eager=True)
        kept = docs.join(dropped, id_col, "left_anti")

        n = (max(self.batches) + 1) if self.batches else 0
        bk_new.write.mode("overwrite").partitionBy("band").parquet(
            os.path.join(self.root, "buckets", f"batch={n}")
        )
        sh_new.select(F.col(id_col).cast("long").alias(id_col), "shingle").write.mode(
            "overwrite"
        ).parquet(os.path.join(self.root, "shingles", f"batch={n}"))
        sh_new.unpersist()
        bk_new.unpersist()
        self.batches.append(n)
        self.max_id = int(lo[1])
        self._write_meta()  # the commit point
        return kept
