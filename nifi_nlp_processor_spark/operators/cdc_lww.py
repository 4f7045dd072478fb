"""Max-LSN last-writer-wins dedupe (SURVEY §2.5 / §4.2 #1).

The distributed generalization of the reference's max-frequency
last-writer-wins upsert (PontusDiscoveryDBClassifierProcessor.java:253-273:
later writer replaces iff strictly greater, ties keep the incumbent).

Three implementations with identical semantics:

``lww_dedupe``        — max(struct(lsn, tiebreak...)) aggregation. THE scale
                        path: Spark plans it as partial+final hash aggregate,
                        so per-key duplicates are combined map-side before
                        the shuffle and a hot (conv_id, turn_idx) key never
                        ships all its duplicates to one reducer.
``lww_dedupe_window`` — row_number() over (partition by key order by lsn
                        desc). Simple, but a window sort has NO partial mode:
                        every duplicate of a hot key lands in one task. Kept
                        as the semantic cross-check in tests.
``salted_lww_dedupe`` — explicit two-phase partial/final (key+salt → key),
                        the hand-built shape SURVEY §4.2 #1 describes. With
                        the agg formulation Spark already does this
                        implicitly; the explicit version exists to make the
                        skew-handling strategy visible/testable and to serve
                        as the template for operators that lack a partial
                        mode (e.g. true row_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _winner_struct(df: DataFrame, keys: list[str], lsn_col: str):
    """max_by(payload, order_key) with order_key = (lsn, content-hash).

    ``max(struct(lsn, ...))`` is semantically identical but pays a
    lexicographic struct comparison (including the text column) on every
    buffer update — measured 3× slower and badly scaling. ``max_by``
    compares only the small order key; the content hash makes same-LSN
    ties deterministic (same content ⇒ same winner on any cluster)."""
    rest = [c for c in df.columns if c not in keys and c != lsn_col]
    # xxhash64() with zero args is an AnalysisException; with no payload
    # columns the lsn alone is a total order (nothing left to tie-break).
    tiebreak = F.xxhash64(*[F.col(c) for c in rest]) if rest else F.lit(0)
    order = F.struct(F.col(lsn_col), tiebreak.alias("_h"))
    payload = F.struct(F.col(lsn_col), *[F.col(c) for c in rest])
    return F.max_by(payload, order).alias("_w"), rest


def lww_dedupe(df: DataFrame, keys: list[str] = ["conv_id", "turn_idx"], lsn_col: str = "lsn") -> DataFrame:
    """One row per key: the max-LSN event (ties broken by remaining columns,
    deterministic). Partial-aggregation-friendly — the skew-safe default."""
    w, rest = _winner_struct(df, keys, lsn_col)
    agg = df.groupBy(*keys).agg(w)
    return agg.select(
        *keys,
        F.col(f"_w.{lsn_col}").alias(lsn_col),
        *[F.col(f"_w.{c}").alias(c) for c in rest],
    ).select(*df.columns)


def lww_dedupe_window(df: DataFrame, keys: list[str] = ["conv_id", "turn_idx"], lsn_col: str = "lsn") -> DataFrame:
    """Window formulation (row_number = 1). Semantically identical; used as
    a cross-check. Same deterministic tie-break as ``_winner_struct``:
    (lsn, content-hash) descending."""
    rest = [c for c in df.columns if c not in keys and c != lsn_col]
    order = [
        F.col(lsn_col).desc(),
        (F.xxhash64(*[F.col(c) for c in rest]) if rest else F.lit(0)).desc(),
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def salted_lww_dedupe(
    df: DataFrame,
    keys: list[str] = ["conv_id", "turn_idx"],
    lsn_col: str = "lsn",
    salt_k: int = 16,
) -> DataFrame:
    """Explicit two-phase LWW: phase 1 reduces per (key, salt) — the salt
    splits a hot key's duplicates across ``salt_k`` reducers — phase 2
    reduces the ≤ salt_k survivors per key. Same result as ``lww_dedupe``.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_k)))
    w, rest = _winner_struct(df, keys, lsn_col)
    partial = salted.groupBy(*keys, "_salt").agg(w)
    partial_flat = partial.select(
        *keys,
        F.col(f"_w.{lsn_col}").alias(lsn_col),
        *[F.col(f"_w.{c}").alias(c) for c in rest],
    )
    return lww_dedupe(partial_flat, keys, lsn_col).select(*df.columns)
