"""Deterministic dataset splitting and weighted sampling for training-data
assembly.

Both operators key every decision off a **stable content-independent
digest** of the document id plus a caller-supplied seed string — never
``rand()`` (non-reproducible across retries/stragglers, poisonous for
exactly-once pipelines) and never Python ``hash()`` (salted per process).
The digest is ``md5(seed || ':' || doc_id)`` truncated to 32 bits, which

* is identical on any engine (the DuckDB oracle reproduces it verbatim:
  ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)``),
* makes splits/samples idempotent under re-runs, speculative execution and
  partial replays — the same doc always lands in the same split,
* costs one JVM hash per row inside whole-stage codegen: no shuffle, no
  UDF, no state. At 100 TB the split is a free narrow transformation that
  parquet scans can pipeline into.

The NiFi reference has no split/sampling processors; this is
training-data pipeline surface (SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _bucket(id_col: Column, seed: str) -> Column:
    """Stable 0..9999 bucket from md5(seed:id) — engine-portable."""
    digest = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"), F.lit(_BUCKETS)
    )


def dataset_split(
    docs: DataFrame,
    *,
    fractions: dict[str, float] | None = None,
    seed: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tag every document with a deterministic split label.

    ``fractions`` maps label -> fraction (must sum to ≤ 1.0; any remainder
    falls into the last label). Labels are assigned by cumulative bucket
    ranges in the given dict order, so the assignment is stable under
    adding *later* splits — growing the val fraction never reshuffles docs
    already in train.
    """
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = _bucket(F.col(id_col), seed)
    expr = None
    hi = 0.0
    labels = list(fractions.items())
    for label, frac in labels[:-1]:
        hi += frac
        cond = bucket < int(round(hi * _BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


def weighted_sample(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    key_col: str = "lang",
    default: float = 1.0,
    seed: str = "sample-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each document with a per-group probability, deterministically.

    ``weights`` maps group value -> keep probability (e.g. language
    up/down-sampling ratios for a pre-training mixture). The keep decision
    uses an independent digest seed from :func:`dataset_split` so sampling
    and splitting never correlate. Rows whose group is absent from
    ``weights`` keep with ``default`` probability.
    """
    for k, p in weights.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"weight for {k!r} must be in [0,1], got {p}")
    bucket = _bucket(F.col(id_col), seed)
    prob = None
    for k, p in weights.items():
        cond = F.col(key_col) == k
        prob = F.when(cond, F.lit(p)) if prob is None else prob.when(cond, F.lit(p))
    prob = F.lit(default) if prob is None else prob.otherwise(F.lit(default))
    return docs.where(bucket < (prob * _BUCKETS).cast("long"))
