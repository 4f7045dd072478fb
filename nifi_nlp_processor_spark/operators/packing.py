"""Token-budget sequence packing: assign documents to fixed-token-budget
packs for LLM pre-training batch assembly.

Semantics are the standard concat-then-chunk pipeline: within each packing
group (language × shard) documents are laid out in a deterministic order
(ascending ``order_col``) and a new pack starts every ``budget`` tokens of
the running total — i.e. ``pack_id = floor(cumulative_tokens_before /
budget)``. Documents are never split; a doc straddling a boundary belongs
to the pack its first token falls in, matching the chunker that slices the
concatenated token stream.

Scale shape: a single global ordering would serialize the corpus through
one window sort, so packing is **sharded** — ``shard = doc_id % n_shards``
(deterministic, engine-portable) bounds every window to one shard of one
language. On a 1000-executor cluster ``n_shards`` is set to a few × the
cluster parallelism: one hash shuffle on (lang, shard), then each task
sorts only its shard locally (Spark lowers the window to a sort within
partitions after that shuffle — no global sort, no driver involvement).
The per-pack rollup reuses the same (lang, shard) partitioning, so it
introduces no second shuffle of the corpus rows.

The NiFi reference has no packing processor; this is training-data
pipeline surface (SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    *,
    tokens: Column | None = None,
    group_col: str = "lang",
    order_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document to a pack; one row per document.

    ``tokens`` defaults to the whitespace token count of ``text``; pass the
    BPE pre-tokenizer count (``textstats.bpe_token_count``) for budget
    parity with a real tokenizer. Output columns: ``(group_col, shard,
    order_col, n_tokens, pack_id, pack_offset)`` where ``pack_offset`` is
    the document's first-token position within the concatenated shard
    stream (so the chunk layout is fully reconstructible downstream).
    """
    if tokens is None:
        tokens = F.size(F.split(F.col("text"), " "))
    shard = F.pmod(F.col(order_col), F.lit(n_shards)).cast("int")
    base = docs.select(
        F.col(group_col),
        shard.alias("shard"),
        F.col(order_col),
        tokens.alias("n_tokens"),
    )
    win = (
        Window.partitionBy(group_col, "shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return base.select(
        group_col,
        "shard",
        order_col,
        "n_tokens",
        F.floor(cum_before / budget).cast("bigint").alias("pack_id"),
        cum_before.cast("bigint").alias("pack_offset"),
    )


def pack_stats(packed: DataFrame, budget: int, group_col: str = "lang") -> DataFrame:
    """Per-pack rollup: docs per pack, token fill, and budget utilisation.

    Groups on the same (group, shard, pack_id) keys the packing window
    produced, so the aggregation is partial+final on an existing
    partitioning — no extra wide shuffle.
    """
    return (
        packed.groupBy(group_col, "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select(
            group_col,
            "shard",
            "pack_id",
            "n_docs",
            "pack_tokens",
            "first_doc",
            "last_doc",
            F.round(F.col("pack_tokens") / F.lit(budget), 6).alias("fill_ratio"),
        )
    )
