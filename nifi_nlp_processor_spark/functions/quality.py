"""Corpus-cleaning operators for the training-data pipeline: boilerplate
line removal (CCNet-style line-level dedup across documents), Gopher-style
repetition statistics, and regex PII redaction.

The reference's purpose is PII discovery/classification over text
(PontusNLPProcessor.java:331-492 extracts entities; the dictionary
classifiers score columns); these operators are the corpus-side
counterparts a 100 TB pre-training pipeline runs: strip lines that repeat
across many documents (navigation chrome, cookie banners, footers), score
intra-document repetition (the Gopher quality rules), and mask the PII the
reference's extractors find.

Scale shape, by operator:

``boilerplate_line_dedup``
    lines are exploded once; the line document-frequency aggregate groups
    on a 64-bit line hash (never shuffles line text); the frequent-line
    set — tiny by construction (only lines repeated across >= min_doc_freq
    docs survive the filter) — is BROADCAST back onto the exploded lines,
    so the expensive side is one explode + one partial+final agg + one
    broadcast join + one per-doc re-aggregation. No self-join, no sort of
    the full corpus.

``repetition_stats``
    per-doc metrics only: the distinct-word fraction is a pure array
    expression (no shuffle); the top word/bigram fractions explode grams
    and aggregate (doc_id, gram) -> doc_id — both shuffles carry 8-byte
    hashes + counts, map-side partial aggregation absorbs the gram skew.

``redact_pii``
    pure ``regexp_replace``/``regexp_count`` column expressions — one
    whole-stage-codegen'd projection, zero shuffle, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def boilerplate_line_dedup(
    docs: DataFrame,
    min_doc_freq: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every line that occurs (exact match, post-trim) in at least
    ``min_doc_freq`` distinct documents — the CCNet/RefinedWeb boilerplate
    rule. Returns one row per input document: ``(id_col, clean_text,
    n_lines, n_removed)``; a document whose every line is boilerplate
    survives with ``clean_text = ''`` (it is the caller's choice to drop
    empties — silently losing rows here would corrupt joins downstream).

    Line identity is a 64-bit ``xxhash64`` of the trimmed line: the
    document-frequency shuffle and the broadcast set carry hashes, never
    text. A 64-bit collision would merge two unrelated lines' counts —
    at ~2^32 distinct lines (far beyond one job's line count) collision
    odds are ~1/2; below 10^9 lines they are negligible and the failure
    mode is one spuriously-removed line, not corruption.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.xxhash64(F.trim("line")))

    # document frequency per line hash: distinct (lh, doc) first so the
    # count is a plain partial+final count, not a count(distinct) expand
    freq = (
        lines.select("lh", id_col)
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_doc_freq)
        .select("lh")
    )

    flagged = lines.join(
        F.broadcast(freq.withColumn("_boiler", F.lit(True))), "lh", "left"
    )
    kept_line = F.when(F.col("_boiler").isNull(), F.col("line"))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count("_boiler").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_boiler").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(id_col, "clean_text", "n_lines", "n_removed")
    )


def _bigrams(words: Column) -> Column:
    """Adjacent word pairs as 'w1 w2' strings (empty array when < 2 words)."""
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1), F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_word_frac: float = 0.10,
    max_top_bigram_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style intra-document repetition metrics (Rae et al. 2021,
    "Scaling Language Models" §A1.1): per document, the fraction of tokens
    that are the single most frequent word / most frequent adjacent bigram,
    plus the distinct-word fraction, and a keep/flag verdict against the
    thresholds. Output: ``(id_col, n_words, distinct_word_frac,
    top_word_frac, top_bigram_frac, is_repetitive)`` with fractions rounded
    to 6 digits for cross-engine comparison.

    Single-pass shape: ONE scan explodes words and bigrams together,
    tagged by kind, and every metric falls out of the one
    (doc, kind, gram) → (doc, kind) → doc aggregation chain — n_words =
    Σ count over word grams, distinct fraction = distinct word grams / Σ,
    top fractions = max / Σ per kind. Exploding both kinds costs the same
    shuffle volume as either alone would at corpus scale (n + n-1 rows of
    8-byte-hashable grams), and the text column is read once.
    """
    words = F.split(F.col(text_col), " ")
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(words, lambda w: F.struct(F.lit("w").alias("k"), w.alias("g"))),
                F.transform(
                    _bigrams(words),
                    lambda b: F.struct(F.lit("b").alias("k"), b.alias("g")),
                ),
            )
        ).alias("kg"),
    ).select(id_col, F.col("kg.k").alias("k"), F.col("kg.g").alias("g"))

    per_kind = (
        grams.groupBy(id_col, "k", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "k")
        .agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )

    def kind(col: str, k: str) -> Column:
        return F.max(F.when(F.col("k") == k, F.col(col)))

    agg = per_kind.groupBy(id_col).agg(
        kind("total", "w").alias("n_words_l"),
        (kind("n_distinct", "w") / kind("total", "w")).alias("dwf"),
        (kind("top_c", "w") / kind("total", "w")).alias("twf"),
        (kind("top_c", "b") / kind("total", "b")).alias("tbf"),
    )
    return agg.select(
        id_col,
        F.col("n_words_l").cast("int").alias("n_words"),
        F.round("dwf", 6).alias("distinct_word_frac"),
        F.round("twf", 6).alias("top_word_frac"),
        F.round(F.coalesce("tbf", F.lit(0.0)), 6).alias("top_bigram_frac"),
        (
            (F.col("twf") > max_top_word_frac)
            | (F.coalesce("tbf", F.lit(0.0)) > max_top_bigram_frac)
        ).alias("is_repetitive"),
    )


def redact_pii(
    docs: DataFrame,
    patterns: dict[str, str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mask every match of each named pattern with ``[NAME]`` and count the
    replacements per type — the redaction dual of the reference's extractor
    registry (same pattern dict shape as ``extract_entities_sql``; the
    reference discovers PII, this removes it). Patterns are applied in dict
    order, each over the previous pattern's output, so overlapping types
    resolve deterministically (first-listed wins the overlap).

    Output: ``(id_col, redacted, n_<name>... )``. Pure column expressions —
    ``regexp_count`` before each rewrite, then chained ``regexp_replace`` —
    one codegen'd projection, no shuffle, no UDF.
    """
    out = docs.select(id_col, F.col(text_col).alias("_t"))
    counts = []
    cur = F.col("_t")
    for name, pat in patterns.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"[{name.upper()}]")
    return out.select(
        id_col, cur.alias("redacted"), *counts
    )
