"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The industry-standard pre-training hygiene step (GPT-3 appendix C /
Llama-style 8-to-13-gram overlap): a training document is *contaminated*
when any of its word n-grams also appears in a benchmark document. This
module re-expresses it Spark-first:

* the benchmark side is tiny relative to the corpus (MBs of eval data vs
  100 TB of crawl), so its distinct n-gram set is **broadcast** — the
  corpus is never shuffled for the membership probe;
* n-grams travel as fixed-width fingerprints (xxhash64 at scale, md5 for
  engine-portable oracle parity), never as raw text;
* the per-document rollup is one hash aggregation on ``doc_id`` — the only
  shuffle in the plan, and it carries just (doc_id, 1) hit rows that
  survived the broadcast semi-probe.

Reference parity: the NiFi repo has no decontamination processor — this is
part of the training-data pipeline surface the engine adds on top of the
reference's extraction operators (SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.operators.doc_dedup import shingles


def _fingerprint(col, hash_fn: str):
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.md5(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination stats vs a benchmark set.

    Returns one row per corpus document that shares at least one word
    ``n``-gram with any benchmark document:
    ``(doc_id, n_hits, n_ngrams, contaminated_frac)`` where ``n_hits`` is
    the number of *distinct* corpus n-grams found in the benchmark n-gram
    set and ``n_ngrams`` the document's distinct n-gram count.

    ``broadcast_benchmark=True`` (the default, and the correct choice
    whenever the benchmark is the usual few-MB eval suite) broadcasts the
    distinct benchmark fingerprint set so the corpus-side probe is a
    map-side hash join — no corpus shuffle before the final per-doc
    rollup. Set it False only when the "benchmark" is itself corpus-sized
    (e.g. cross-corpus overlap), which falls back to a fingerprint-keyed
    shuffle join.
    """
    corp_sh = shingles(corpus, k=n, text_col=text_col, id_col=id_col).select(
        id_col, _fingerprint(F.col("shingle"), hash_fn).alias("fp")
    )
    bench_sh = (
        shingles(benchmark, k=n, text_col=text_col, id_col=id_col)
        .select(_fingerprint(F.col("shingle"), hash_fn).alias("fp"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)

    # distinct n-grams per doc (shingles() already dedupes per doc), so the
    # join hit count IS the distinct-hit count — no count(distinct) needed.
    hits = (
        corp_sh.join(bench_sh, "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = corp_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    return (
        hits.join(totals, id_col)
        .select(
            id_col,
            "n_hits",
            "n_ngrams",
            F.round(F.col("n_hits") / F.col("n_ngrams"), 6).alias(
                "contaminated_frac"
            ),
        )
    )
