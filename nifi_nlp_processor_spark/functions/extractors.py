"""Entity extraction: the reference's regex-model registry, Spark-first.

The reference compiles a JSON ``{type: regex}`` registry once at schedule
time (RegexJSONValidator.java:70-72, flags MULTILINE|CASE_INSENSITIVE) and,
per record, runs find-all with the group rule of
PontusNLPProcessor.java:437-492: if a pattern has no capture groups the
whole match is kept; otherwise ONLY groups 1..n (never group 0), null
(non-participating) groups skipped. Results accumulate per type into an
unordered, deduplicated set stored as ``pg_nlp_res_<type.lower()>``
(PontusProcessorBase.java:85-93,303-327), set-union-merged with any
pre-existing value of the same column.

Two execution paths:

``extract_entities``     — mapInPandas (Arrow batches), exact reference
                           parity including Java-only dialect translation
                           and the group rule. The patterns compile once per
                           Python worker, not per row (the reference's
                           @OnScheduled one-time compile, L1).
``extract_entities_sql`` — pure Column expressions (``regexp_extract_all``),
                           whole-stage-codegen'd JVM path for patterns whose
                           dialect the JVM regex engine shares. Preferred in
                           the hot path; the pandas path exists for parity
                           and for patterns with Python-only constructs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's default registry (PontusNLPProcessor.java:97-105),
# translated to the Python/RE2-friendly dialect where needed. These are
# config *data* (the reference treats them as a user-supplied JSON property),
# reproduced for parity testing.
DEFAULT_REGISTRY: dict[str, str] = {
    "email": (
        r"(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[a-z0-9!#$%&'*+/=?^_`{|}~-]+)*"
        r'|"(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21\x23-\x5b\x5d-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*")'
        r"@(?:(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"
        r"|\[(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|[a-z0-9-]*[a-z0-9]:"
        r"(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21-\x5a\x53-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])+)\])"
    ),
    "URL": (
        r"(?:(?:https?|ftp)://)(?:\S+(?::\S*)?@)?"
        r"(?:(?!10(?:\.\d{1,3}){3})(?!127(?:\.\d{1,3}){3})(?!169\.254(?:\.\d{1,3}){2})"
        r"(?!192\.168(?:\.\d{1,3}){2})(?!172\.(?:1[6-9]|2\d|3[0-1])(?:\.\d{1,3}){2})"
        r"(?:[1-9]\d?|1\d\d|2[01]\d|22[0-3])(?:\.(?:1?\d{1,2}|2[0-4]\d|25[0-5])){2}"
        r"(?:\.(?:[1-9]\d?|1\d\d|2[0-4]\d|25[0-4]))"
        # Java \x{00a1}-\x{ffff} → Python \u00a1-\uffff (SURVEY §2.8 dialect note)
        r"|(?:(?:[a-z\u00a1-\uffff0-9]+-?)*[a-z\u00a1-\uffff0-9]+)"
        r"(?:\.(?:[a-z\u00a1-\uffff0-9]+-?)*[a-z\u00a1-\uffff0-9]+)*"
        r"(?:\.(?:[a-z\u00a1-\uffff]{2,})))(?::\d{2,5})?(?:/[^\s]*)?"
    ),
    "phone": r"\+(?:[0-9] ?){6,14}[0-9]",
    "cred_card": r"(?<=[^\d \-])[ \-]*(?:\d[ \-]*){13,16}(?=[^\d \-])",
    "twitterHandle": r"\@([a-z0-9_]{1,15}\b)",
    "post_code": (
        r"(([A-Z][A-HJ-Y]?\d[A-Z\d]?|ASCN|STHL|TDCU|BBND|[BFS]IQQ|PCRN|TKCA) ?\d[A-Z]{2}"
        r"|BFPO ?\d{1,4}|(KY\d|MSR|VG|AI)[ -]?\d{4}|[A-Z]{2} ?\d{2}|GE ?CX|GIR ?0A{2}|SAN ?TA1)"
    ),
    "address": r"Address.*:(.*)$",
}

_JAVA_HEX_CLASS = re.compile(r"\\x\{([0-9a-fA-F]+)\}")

# PontusProcessorBase.java:72 — default threshold keeps everything,
# including zero-probability spans (the filter is strict `>`).
DEFAULT_THRESHOLD = -0.01


def input_precedence(
    attr_col: Column | None,
    prop_value: Column | str | None,
    content_col: Column | str = "text",
) -> Column:
    """P1 — the entry of every reference processor (getInputData,
    PontusProcessorBase.java:234-263): attribute first, configured property
    second (expression-language → any Column expression here), file content
    last. One ``coalesce``; a null/absent stage falls through exactly like
    the reference's null checks."""
    stages = []
    if attr_col is not None:
        stages.append(attr_col)
    if prop_value is not None:
        stages.append(F.lit(prop_value) if isinstance(prop_value, str) else prop_value)
    stages.append(F.col(content_col) if isinstance(content_col, str) else content_col)
    return F.coalesce(*stages)


def threshold_filter(entities: Column, threshold: float = DEFAULT_THRESHOLD) -> Column:
    """P2 — probability-threshold filter over an
    ``array<struct<value:string, prob:double>>`` enrichment column: keep a
    span iff ``prob > threshold`` — strict `>`, so the default -0.01 keeps
    all spans including prob==0.0 ones, and a threshold equal to a span's
    prob drops it (PontusProcessorBase.java:69-83; applied in
    PontusNLPProcessor.java:394-403 and the Watson/Google/AWS variants)."""
    return F.filter(entities, lambda x: x["prob"] > F.lit(float(threshold)))


def limit_entities(entities: Column, limit: int = 250) -> Column:
    """T2 — entity cap, the Watson ``EntitiesOptions.limit(250)``
    (PontusNLPWatsonProcessor.java:162): first ``limit`` elements."""
    return F.slice(entities, 1, limit)


def full_match(col: Column, pattern: str) -> Column:
    """P4 — anchored full-match predicate, the regex classifier's
    ``pattern.matcher(data).matches()`` (no flags,
    PontusDiscoveryRegexDBClassifierProcessor.java:115-119). ``rlike`` runs
    the JVM regex engine — the same dialect the reference compiles — so the
    pattern is passed through untranslated, wrapped in a non-capturing
    anchor."""
    return col.rlike(f"^(?:{pattern})$")


def regex_span_backend(pattern: str, prob: float = 1.0):
    """A deterministic enrichment backend: JVM find-all over the input with
    the group-1..n rule, each hit emitted as ``(value, prob)``. The
    reference's in-process regex path (E1) attaches no probability — spans
    are certain — so prob defaults to 1.0 (kept by any threshold < 1)."""

    def backend(data: Column) -> Column:
        n_groups = re.compile(translate_java_regex(pattern)).groups
        inline = "(?im)" + pattern
        if n_groups == 0:
            arr = F.regexp_extract_all(data, F.lit(inline), 0)
        else:
            parts = [
                F.regexp_extract_all(data, F.lit(inline), g)
                for g in range(1, n_groups + 1)
            ]
            arr = F.filter(
                F.concat(*parts) if len(parts) > 1 else parts[0],
                lambda x: x != "",
            )
        return F.transform(
            arr,
            lambda v: F.struct(
                v.alias("value"), F.lit(float(prob)).alias("prob")
            ),
        )

    return backend


def enrich_entities(
    df: DataFrame,
    backends: dict,
    attr_col: Column | None = None,
    prop_value: Column | str | None = None,
    text_col: str = "text",
    threshold: float = DEFAULT_THRESHOLD,
    limit: int = 250,
    prefix: str = "pg_nlp_res_",
) -> DataFrame:
    """The shared orchestration all five reference enrichment processors
    run (SURVEY §2.9): input precedence (P1) → backend span extraction →
    entity cap (T2, the Watson request-side ``limit(250)``) → strict
    probability-threshold filter (P2) → per-type sorted-distinct set-union
    merge into ``pg_nlp_res_<type>`` (A1/A2).

    ``backends`` maps entity type → callable ``(data: Column) ->
    array<struct<value:string, prob:double>>``. Deterministic backends
    (``regex_span_backend``) stay pure Column expressions — whole-stage
    codegen, no Python on the hot path; a model-backed backend would wrap
    a pandas UDF behind the same signature. The cap is applied before the
    threshold, as the reference's Watson flow does (the 250 cap is on the
    API request, relevance filtering happens on the response,
    PontusNLPWatsonProcessor.java:162,202-210).
    """
    data = input_precedence(attr_col, prop_value, text_col)
    out = df
    for etype, backend in sorted(backends.items()):
        spans = threshold_filter(
            limit_entities(backend(data), limit), threshold
        )
        vals = F.transform(spans, lambda x: x["value"])
        c = result_col(etype, prefix)
        merged = (
            F.array_union(F.coalesce(F.col(c), F.array()), vals)
            if c in out.columns
            else vals
        )
        out = out.withColumn(c, F.array_sort(F.array_distinct(merged)))
    return out


def translate_java_regex(pattern: str) -> str:
    """Java→Python dialect: ``\\x{00a1}`` → ``\\u00a1`` (Python ``re``
    rejects Java's braced hex escape; lookbehind/lookahead carry over)."""
    return _JAVA_HEX_CLASS.sub(lambda m: f"\\u{int(m.group(1), 16):04x}", pattern)


def compile_registry(registry: dict[str, str]) -> dict[str, re.Pattern]:
    """Validate + compile at plan-build time (the reference's eager validator
    compile, RegexJSONValidator.java:83-104 / @OnScheduled L1). Raises on an
    invalid pattern before any epoch runs."""
    return {
        k: re.compile(translate_java_regex(p), re.IGNORECASE | re.MULTILINE)
        for k, p in registry.items()
    }


def result_col(entity_type: str, prefix: str = "pg_nlp_res_") -> str:
    # reference lowercases type keys when storing (PontusProcessorBase.java:307)
    return prefix + entity_type.lower()


def extract_entities(
    df: DataFrame,
    registry: dict[str, str] | None = None,
    text_col: str = "text",
    prefix: str = "pg_nlp_res_",
) -> DataFrame:
    """Arrow-batched parity extractor (mapInPandas — E1 analogue).

    Adds one ``array<string>`` column per registry type, sorted-distinct
    (the reference stores an unordered Set; we sort for deterministic
    output). If the column already exists it is set-union-merged
    (PontusProcessorBase.java:311-320 semantics).
    """
    registry = dict(registry or DEFAULT_REGISTRY)
    compile_registry(registry)  # fail fast on the driver
    cols = {k: result_col(k, prefix) for k in registry}
    existing = set(df.columns)

    out_fields = list(df.schema.fields) + [
        T.StructField(c, T.ArrayType(T.StringType()), True)
        for c in cols.values()
        if c not in existing
    ]
    out_schema = T.StructType(out_fields)
    reg_items = sorted(registry.items())

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # compile once per worker (executor-local singleton, L1 analogue)
        pats = {k: re.compile(translate_java_regex(p), re.IGNORECASE | re.MULTILINE) for k, p in reg_items}
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            for k, pat in pats.items():
                c = cols[k]
                prior = pdf[c] if c in pdf.columns else None
                vals = []
                for i, txt in enumerate(texts):
                    s: set[str] = set()
                    for m in pat.finditer(txt):
                        if pat.groups == 0:
                            s.add(m.group(0))
                        else:
                            # groups 1..n only, non-participating skipped
                            s.update(g for g in m.groups() if g is not None)
                    if prior is not None:
                        pv = prior.iloc[i]
                        if pv is not None and not (isinstance(pv, float) and pd.isna(pv)):
                            s.update(pv)
                    vals.append(sorted(s))
                pdf[c] = vals
            yield pdf

    return df.mapInPandas(fn, out_schema)


def extract_entities_sql(
    df: DataFrame,
    registry: dict[str, str],
    text_col: str = "text",
    prefix: str = "pg_nlp_res_",
) -> DataFrame:
    """JVM-side extractor: ``regexp_extract_all`` per type, codegen'd.

    Group rule mapping: group idx 0 when the pattern has no groups, else the
    union of ``regexp_extract_all(text, pat, g)`` for g=1..n with
    non-participating ('' from a participating-empty vs non-participating
    ambiguity) dropped — callers should prefer patterns with ≤1 group here
    and use ``extract_entities`` for exact parity on exotic ones.
    """
    out = df
    for k, pat in sorted(registry.items()):
        n_groups = re.compile(translate_java_regex(pat)).groups
        inline = "(?im)" + pat  # Java MULTILINE|CASE_INSENSITIVE flags
        c = result_col(k, prefix)
        if n_groups == 0:
            arr = F.regexp_extract_all(F.col(text_col), F.lit(inline), 0)
        else:
            parts = [
                F.regexp_extract_all(F.col(text_col), F.lit(inline), g)
                for g in range(1, n_groups + 1)
            ]
            arr = F.filter(
                F.concat(*parts) if len(parts) > 1 else parts[0],
                lambda x: x != "",
            )
        merged = (
            F.array_union(F.coalesce(F.col(c), F.array()), arr)
            if c in out.columns
            else arr
        )
        out = out.withColumn(c, F.array_sort(F.array_distinct(merged)))
    return out
