"""Text analysis for the training-data pipeline: token stats, quality
scoring, language-ID heuristic, document fingerprinting.

The reference's text analysis is model-driven NER (PontusNLPProcessor.java:
331-492); these are the deterministic, engine-portable statistics a corpus
pipeline runs before/alongside enrichment. All pure Column expressions —
whole-stage codegen, no UDFs, no shuffle (per-row projections; any groupBy
on top is the caller's choice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("a", "the", "of", "and", "to", "in")


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset so the
# identical pattern runs on the JVM regex engine AND RE2 (DuckDB oracle):
# contractions | space?-letter-run | space?-digit-run | space?-punct-run |
# whitespace-run. Counts pre-tokens — the sequence BPE merges start from,
# a stable proxy for LLM token budgeting without a vocab file.
BPE_PRETOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Approximate LLM token count via the BPE pre-tokenizer regex —
    whole-stage-codegen'd ``regexp_count``, no UDF."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    toks = F.split(text, " ")
    stops = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    )
    return stops / F.size(toks)


def avg_token_len(text: Column) -> Column:
    toks = F.split(text, " ")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def nonascii_ratio(text: Column) -> Column:
    """Share of non-ASCII characters — the n-gram-free language-ID signal
    (CJK vs latin scripts)."""
    return (
        F.length(F.regexp_replace(text, "[\\x00-\\x7f]", ""))
        / F.length(text)
    )


def quality_stats(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    max_stop_ratio: float = 0.5,
) -> DataFrame:
    """Adds n_tokens, stop_ratio, avg_tok_len, nonascii_ratio, is_quality.
    Ratios are rounded to 6 digits so downstream comparisons are stable
    across engines."""
    t = F.col(text_col)
    out = (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("stop_ratio", F.round(stopword_ratio(t, stopwords), 6))
        .withColumn("avg_tok_len", F.round(avg_token_len(t), 6))
        .withColumn("nonascii_ratio", F.round(nonascii_ratio(t), 6))
    )
    return out.withColumn(
        "is_quality",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stop_ratio") <= max_stop_ratio),
    )


def lang_id(text: Column, cjk_threshold: float = 0.3) -> Column:
    """Heuristic script-level language ID: 'cjk' when the non-ASCII char
    share exceeds the threshold, else 'latin'."""
    return F.when(nonascii_ratio(text) > cjk_threshold, "cjk").otherwise("latin")


def fingerprint(text: Column) -> Column:
    """Stable 128-bit content fingerprint of the normalized text (lowercase,
    squeezed whitespace) — the exact-dedup / provenance key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))
