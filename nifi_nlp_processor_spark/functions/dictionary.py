"""Dictionary membership + column classification (the reference's
Lucene-index writer/reader/classifier trio, Spark-first).

Reference semantics re-expressed:

* Dictionary store (PontusLuceneIndexWriterProcessor.java:104-187): one
  Lucene index per semantic domain, single field "data"; ``TextField`` =
  analyzed (lowercase/accent-folding BrazilianAnalyzer) vs ``StringField``
  = exact. → a dictionary DataFrame ``(domain, value, mode)``; analyzed
  mode normalizes with lower + accent-strip. Broadcast to executors.
* Membership probe (PontusLuceneIndexReaderProcessor.java:129-135): top-1
  existence search per candidate. → broadcast LEFT SEMI join (existence ⇒
  no scoring, no sort) or a ``matched`` boolean via left join.
* Percentage aggregate (PontusDiscoveryDBClassifierProcessor.java:159-185):
  per column, found/total*100.0 over ~10 sample values. → hash aggregate
  with map-side partial (free in Spark).
* Max-frequency LWW winner (:200-286): later classifier replaces the
  winning domain iff strictly greater frequency; ties keep the incumbent;
  every probe appends to ``semanticDomains``. → window LWW ordered by
  (frequency DESC, arrival ASC) — the same rule the CDC dedupe generalizes
  to max-LSN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# accent fold approximating BrazilianAnalyzer's lowercase+ASCII folding
_ACCENTS_IN = "áàâãäéèêëíìîïóòôõöúùûüçñýÿ"
_ACCENTS_OUT = "aaaaaeeeeiiiiooooouuuucnyy"

# Portuguese plural-reduction suffix rules (post accent-fold, so ões→oes),
# applied first-match-only — a documented approximation of the
# BrazilianAnalyzer's stemmer (PontusLuceneIndexWriterProcessor.java:73
# uses BrazilianAnalyzer, whose BrazilianStemmer starts with exactly this
# plural step). Full RSLP also strips diminutive/augmentative/verb
# suffixes; for dictionary membership the plural step is what moves
# percentages on name/place fixtures.
_PT_PLURAL_RULES: list[tuple[str, str]] = [
    ("oes$", "ao"),   # camaroes → camarao
    ("aes$", "ao"),   # capitaes → capitao
    ("ais$", "al"),   # animais → animal
    ("eis$", "el"),   # papeis → papel
    ("ois$", "ol"),   # lencois → lencol
    ("ns$", "m"),     # jardins → jardim
    ("les$", "l"),    # males → mal
    ("res$", "r"),    # flores → flor
    ("([aeiou])s$", "$1"),  # casas → casa (plain plural; $1 = JVM backref)
]


def normalize_analyzed(col: Column, stem_pt: bool = False) -> Column:
    """'analyzed' (TextField) normalization: lowercase + accent fold +
    trim. Exact mode (StringField) stores the value verbatim.

    ``stem_pt=True`` additionally applies the Portuguese plural-reduction
    rules above (mode 'analyzed_pt') — the BrazilianAnalyzer-shaped
    normalization of the reference's Lucene store, as ordered
    first-match-only ``regexp_replace`` Column expressions (stays in
    codegen; no UDF)."""
    out = F.translate(F.lower(F.trim(col)), _ACCENTS_IN, _ACCENTS_OUT)
    if stem_pt:
        # a chained WHEN applies the FIRST matching rule only (later rules
        # must not re-fire on an already-reduced token)
        stemmed = None
        for pat, rep in _PT_PLURAL_RULES:
            cond = out.rlike(pat)
            applied = F.regexp_replace(out, pat, rep)
            stemmed = (
                F.when(cond, applied) if stemmed is None else stemmed.when(cond, applied)
            )
        out = stemmed.otherwise(out)
    return out


def _key_fn(mode: str):
    """Normalization key per dictionary mode: 'exact' (StringField,
    verbatim), 'analyzed' (TextField: lower/accent-fold/trim),
    'analyzed_pt' (analyzed + Portuguese plural reduction — the
    BrazilianAnalyzer approximation)."""
    if mode == "exact":
        return lambda c: c
    if mode == "analyzed":
        return normalize_analyzed
    if mode == "analyzed_pt":
        return lambda c: normalize_analyzed(c, stem_pt=True)
    raise ValueError(f"unknown dictionary mode {mode!r}")


def parse_query_format(fmt: str) -> str:
    """P5 — the Lucene query-format contract the reference's users
    actually configure (PontusProcessorBase.java:109-131): a Java
    ``String.format`` template that must contain EXACTLY one ``%s`` and
    must survive formatting (the validator checks
    ``String.format(input, "FOOO").contains("FOOO")``). ``%s`` queries the
    candidate as-is (exact membership); a template carrying ``~`` (the
    documented ``~%s`` form) is a Lucene-style similarity match → fuzzy
    membership. Returns 'exact' or 'fuzzy'; raises ``ValueError`` on an
    invalid template — eagerly, at config time, like the reference
    validator."""
    if fmt.count("%s") != 1:
        raise ValueError(
            f"the format {fmt!r} must contain one and only one %s element inside."
        )
    try:
        formatted = fmt % "FOOO"
    except (TypeError, ValueError) as e:
        raise ValueError(f"the format {fmt!r} does not format cleanly: {e}") from e
    if "FOOO" not in formatted:
        raise ValueError(
            f"the format {fmt!r} must contain one and only one %s element inside."
        )
    return "fuzzy" if "~" in fmt else "exact"


def membership_with_format(
    candidates: DataFrame,
    dictionary: DataFrame,
    query_format: str = "%s",
    **kwargs,
) -> DataFrame:
    """``membership`` driven by the reference's query-format property:
    ``"%s"`` routes to exact/analyzed membership, ``"~%s"`` to the fuzzy
    (edit-distance) probe — the dispatch the reference performs by
    templating the Lucene query string
    (PontusDiscoveryDBClassifierProcessor.java:173 ``String.format``)."""
    return membership(
        candidates,
        dictionary,
        fuzzy=parse_query_format(query_format) == "fuzzy",
        **kwargs,
    )


def membership(
    candidates: DataFrame,
    dictionary: DataFrame,
    candidate_col: str = "value",
    dict_value_col: str = "value",
    mode: str = "analyzed",
    fuzzy: bool = False,
    max_edits: int = 2,
) -> DataFrame:
    """Adds boolean ``matched``: candidate present in the dictionary.

    mode='analyzed' joins on the normalized key (TextField semantics),
    'exact' on the raw value (StringField). The dictionary side is
    broadcast — it is the small relation by construction (the reference
    mmaps it on every node; broadcast is the cluster analogue).

    fuzzy=True mirrors the reader's ``~%s`` Lucene fuzzy query format
    (PontusProcessorBase.java:109-131): edit distance ≤ max_edits. This is
    a broadcast theta-join (levenshtein), cost |candidates|×|dict| — only
    for small dictionaries, as in the reference. Callers holding the raw
    format string use ``membership_with_format``, which validates and
    dispatches it.
    """
    key = _key_fn(mode)
    dic = dictionary.select(key(F.col(dict_value_col)).alias("_dict_key")).distinct()
    if not fuzzy:
        cand_key = key(F.col(candidate_col))
        joined = candidates.withColumn("_cand_key", cand_key).join(
            F.broadcast(dic),
            F.col("_cand_key") == F.col("_dict_key"),
            "left",
        )
        return (
            joined.withColumn("matched", F.col("_dict_key").isNotNull())
            .drop("_cand_key", "_dict_key")
        )
    # Fuzzy probe runs over DISTINCT candidate keys only — the theta-join
    # (levenshtein) cost is |distinct keys|×|dict|, and the boolean is then
    # joined back on the key, so duplicate candidate rows are preserved
    # 1:1 (joining the hit set back on all candidate columns would multiply
    # duplicated rows — the round-1 row-inflation bug).
    cand = candidates.withColumn("_cand_key", key(F.col(candidate_col)))
    probe_keys = cand.select("_cand_key").distinct()
    hit_keys = probe_keys.join(
        F.broadcast(dic),
        F.levenshtein(F.col("_cand_key"), F.col("_dict_key")) <= max_edits,
        "left_semi",
    ).withColumn("matched", F.lit(True))
    return (
        cand.join(F.broadcast(hit_keys), "_cand_key", "left")
        .withColumn("matched", F.coalesce(F.col("matched"), F.lit(False)))
        .drop("_cand_key")
    )


def parse_raw_dictionary(col: Column) -> Column:
    """S8/P6 — the writer/reader shape dispatch
    (PontusLuceneIndexWriterProcessor.java:160-177 /
    PontusLuceneIndexReaderProcessor.java:152-171): input starting with
    ``[`` is a JSON array of strings; else, input containing a newline is
    split on ``\\n`` (trailing empties dropped, as Java ``String.split``
    does); else — a bare single value — yields ZERO entries, the edge where
    the reference reader computes found/total = 0/0 ⇒ NaN. Returns an
    ``array<string>`` column."""
    stripped = F.regexp_replace(col, r"\n+$", "")
    return (
        F.when(col.startswith("["), F.from_json(col, "array<string>"))
        .when(
            col.contains("\n"),
            F.when(stripped == "", F.array().cast("array<string>")).otherwise(
                F.split(stripped, "\n")
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def dictionary_from_raw(
    raw: DataFrame,
    input_col: str = "raw",
    mode: str = "analyzed",
) -> DataFrame:
    """Dictionary build (the Lucene index-writer analogue, SURVEY §2.1 S8):
    each raw blob (JSON-array or newline file content) explodes to one
    ``value`` row; 'analyzed' mode stores the normalized key (TextField +
    BrazilianAnalyzer ≈ lowercase/accent-fold/trim), 'exact' stores
    verbatim (StringField). Run once, then broadcast via ``membership``."""
    vals = raw.select(
        F.explode(parse_raw_dictionary(F.col(input_col))).alias("value")
    )
    if mode != "exact":
        vals = vals.select(_key_fn(mode)(F.col("value")).alias("value"))
    return vals.distinct()


def dictionary_from_file(
    spark, path: str, mode: str = "analyzed"
) -> DataFrame:
    """S4 — newline dictionary file scan (DictionaryJSONValidator.java:
    40-57: one entry per line, read eagerly at validate time): one
    ``value`` row per non-empty line, normalized per mode, distinct —
    ready to broadcast into ``membership``. Unlike the raw-blob path
    (``dictionary_from_raw``) the file reader has no shape dispatch: a
    file IS the newline shape."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("value"))
    lines = lines.where(F.col("value") != "")
    if mode != "exact":
        lines = lines.select(_key_fn(mode)(F.col("value")).alias("value"))
    return lines.distinct()


def save_dictionary(dictionary: DataFrame, path: str) -> None:
    """S8 — the persisted dictionary store (the Lucene on-disk index
    analogue, one index per domain → one parquet partition per domain,
    PontusLuceneIndexWriterProcessor.java:104-124 append mode). A
    ``domain`` column is required; values are stored as built (run
    ``normalize_analyzed`` upstream for TextField semantics)."""
    dictionary.write.mode("append").partitionBy("domain").parquet(path)


def load_dictionary(spark, path: str, domain: str | None = None) -> DataFrame:
    """Read the persisted store back; with ``domain`` the read
    partition-prunes to that domain's files only (the reader's one-index-
    per-domain open, PontusLuceneIndexReaderProcessor.java:107-127).
    Distinct on read gives the writer's append mode set semantics."""
    df = spark.read.parquet(path)
    if domain is not None:
        df = df.where(F.col("domain") == domain)
    return df.distinct()


def percentage_match(
    probed: DataFrame,
    group_cols: list[str] = ["col_name"],
    matched_col: str = "matched",
) -> DataFrame:
    """found/total*100.0 per group (A3) — avg of the 0/1 indicator × 100,
    double division exactly as PontusDiscoveryDBClassifierProcessor.java:175."""
    return probed.groupBy(*group_cols).agg(
        (F.avg(F.col(matched_col).cast("int")) * 100.0).alias("frequency")
    )


def classify_columns(
    col_samples: DataFrame,
    dictionaries: DataFrame,
    domain: str,
    mode: str = "analyzed",
    group_cols: list[str] = ["col_name"],
    value_col: str = "value",
) -> DataFrame:
    """One classifier pass: probe every sample value of every column against
    one domain's dictionary → (group_cols…, domain, frequency). The chained
    multi-processor flow of the reference (classifier per domain,
    PontusDiscoveryDBClassifierProcessorTest.java:153-162) is a union of
    these, resolved by ``lww_domain_winner``."""
    dic = dictionaries.where(F.col("domain") == domain)
    probed = membership(col_samples, dic, candidate_col=value_col, mode=mode)
    return percentage_match(probed, group_cols).withColumn("domain", F.lit(domain))


def classify_columns_multi(
    col_samples: DataFrame,
    dictionaries: DataFrame,
    arrivals: dict[str, int],
    mode: str = "analyzed",
    group_cols: list[str] = ["col_name"],
    value_col: str = "value",
) -> DataFrame:
    """All classifier passes fused into ONE scan: the chained reference
    flow probes the sample stream once per domain (one processor each,
    PontusDiscoveryDBClassifierProcessorTest.java:153-162), which in Spark
    means re-exploding and re-joining the token stream per domain. This
    variant explodes once, joins once against the broadcast UNION
    dictionary (domain column carried through), and derives every
    (group, domain, frequency, arrival) row from two aggregations — at
    scale the sample-stream scan dominates, so cost is ~1/n_domains of the
    chained form. Semantics identical to unioning ``classify_columns``
    passes (same oracle; zero-frequency probes retained)."""
    key = _key_fn(mode)
    dic = dictionaries.select(
        "domain", key(F.col("value")).alias("_dict_key")
    ).distinct()
    cand = col_samples.withColumn("_cand_key", key(F.col(value_col)))
    totals = cand.groupBy(*group_cols).agg(F.count("*").alias("_total"))
    found = (
        cand.join(
            F.broadcast(dic), F.col("_cand_key") == F.col("_dict_key")
        )
        .groupBy(*group_cols, "domain")
        .agg(F.count("*").alias("_found"))
    )
    spark = col_samples.sparkSession
    grid = spark.createDataFrame(
        sorted(arrivals.items()), "domain string, arrival int"
    )
    return (
        totals.crossJoin(F.broadcast(grid))
        .join(found, [*group_cols, "domain"], "left")
        .select(
            *group_cols,
            "domain",
            "arrival",
            (
                F.coalesce(F.col("_found"), F.lit(0)) / F.col("_total") * 100.0
            ).alias("frequency"),
        )
    )


def lww_domain_winner(
    classified: DataFrame,
    group_cols: list[str] = ["col_name"],
    arrival_col: str = "arrival",
) -> DataFrame:
    """Winner per column: max frequency, ties keep the earliest arrival
    (strict `<` replacement, PontusDiscoveryDBClassifierProcessor.java:262),
    zero-frequency probes can never create an entry (:221-229). All probes
    are retained as ``semantic_domains`` (the appended semanticDomains list,
    :253-273)."""
    nonzero = classified.where(F.col("frequency") > 0.0)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("frequency").desc(), F.col(arrival_col).asc()
    )
    winners = (
        nonzero.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*group_cols, "domain", "frequency")
    )
    all_probes = classified.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(arrival_col), F.col("domain"), F.col("frequency")))
        ).alias("semantic_domains")
    )
    return winners.join(all_probes, group_cols, "left")
