"""ColMetadata envelope: the classifier trio's real input/output format.

The reference's discovery classifiers consume a JSON envelope stored in the
``pg_rdb_col_metadata`` attribute::

    {"colMetaData": [{"colName": ..., "ordinalPos": ..., "vals": [...]}, ...],
     "tableCatalog": ..., "tableName": ..., "fqn": ..., "tableType": ...,
     "tableRemarks": ...}

(POJO ``ColMetadata.java:9-21``; envelope parse
``PontusDiscoveryDBClassifierProcessor.java:90-147,154-157,309``) and emit a
nested discovery result into ``pg_discovery_col_data``::

    {"metadata": {"columns": [{"name", "domain", "frequency",
                               "semanticDomains": [{"id", "frequency"}]}]}}

built by ``upsertDiscoveryData`` (:200-286). Spark-first re-expression:
``from_json`` with an explicit schema → explode columns → explode sample
vals → classify (dictionary membership or regex full-match) → per-column
upsert fold → ``to_json`` nested output. The whole chained-classifier flow
is one DataFrame plan; Catalyst fuses the explodes with the probes.

Upsert semantics reproduced exactly (:221-229, :253-273):

* the FIRST classifier creates one entry per column; ``domain``/
  ``frequency``/``semanticDomains`` appear only if its frequency > 0.0;
* a LATER classifier replaces the winner iff ``currFrequency < frequency``
  (strict — ties keep the incumbent, a missing frequency counts as 0.0) and
  ONLY THEN appends its semantic to ``semanticDomains`` — i.e.
  ``semanticDomains`` is the strictly-improving prefix-maxima subsequence
  of the probe sequence, NOT all probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_nlp_processor_spark.functions.dictionary import membership
from nifi_nlp_processor_spark.functions.extractors import full_match

COL_METADATA_SCHEMA = T.StructType(
    [
        T.StructField(
            "colMetaData",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("colName", T.StringType()),
                        T.StructField("primaryKeyName", T.StringType()),
                        T.StructField("foreignKeyName", T.StringType()),
                        T.StructField("typeName", T.StringType()),
                        T.StructField("colRemarks", T.StringType()),
                        T.StructField("isAutoIncr", T.StringType()),
                        T.StructField("isGenerated", T.StringType()),
                        T.StructField("octetLen", T.LongType()),
                        T.StructField("ordinalPos", T.LongType()),
                        T.StructField("defVal", T.StringType()),
                        T.StructField("colSize", T.LongType()),
                        T.StructField("vals", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
        T.StructField("tableCatalog", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("fqn", T.StringType()),
        T.StructField("tableType", T.StringType()),
        T.StructField("tableRemarks", T.StringType()),
    ]
)


def parse_col_metadata(df: DataFrame, json_col: str = "pg_rdb_col_metadata") -> DataFrame:
    """Envelope → long format: one row per (table, column, sample value).
    Column names are trimmed like the reference's
    ``colMetadata.getColName().trim()`` (:180). Duplicate sample values are
    retained — the reference's ``totalNum`` counts every val."""
    env = df.select(
        F.from_json(F.col(json_col), COL_METADATA_SCHEMA).alias("_env")
    )
    cols = env.select(
        F.col("_env.tableName").alias("table_name"),
        F.col("_env.fqn").alias("fqn"),
        F.explode("_env.colMetaData").alias("_c"),
    )
    return cols.select(
        "table_name",
        "fqn",
        F.trim(F.col("_c.colName")).alias("col_name"),
        F.col("_c.ordinalPos").alias("ordinal_pos"),
        F.explode("_c.vals").alias("value"),
    )


def classify_dict(
    samples: DataFrame,
    dictionary: DataFrame,
    domain: str,
    arrival: int,
    mode: str = "analyzed",
) -> DataFrame:
    """One dictionary-classifier pass over the long format: per
    (table, column), found/total*100.0 (:159-185)."""
    probed = membership(samples, dictionary, candidate_col="value", mode=mode)
    return _pct(probed, domain, arrival)


def classify_regex(samples: DataFrame, pattern: str, domain: str, arrival: int) -> DataFrame:
    """One regex-classifier pass: anchored full match per sample value
    (PontusDiscoveryRegexDBClassifierProcessor.java:115-119,131-149)."""
    probed = samples.withColumn("matched", full_match(F.col("value"), pattern))
    return _pct(probed, domain, arrival)


def _pct(probed: DataFrame, domain: str, arrival: int) -> DataFrame:
    return probed.groupBy("table_name", "fqn", "col_name", "ordinal_pos").agg(
        (F.avg(F.col("matched").cast("int")) * 100.0).alias("frequency")
    ).withColumn("domain", F.lit(domain)).withColumn("arrival", F.lit(arrival))


def upsert_discovery(classified: DataFrame) -> DataFrame:
    """Fold the chained classifier passes into per-column discovery state:
    winner = max frequency with earliest arrival on ties (strict `<`
    replacement), ``semantic_domains`` = the strictly-improving
    prefix-maxima subsequence (see module doc). Columns where every probe
    scored 0.0 keep a row with null domain/frequency — the reference still
    emits ``{"name": col}`` for them (:221-229: entry created, fields
    withheld)."""
    w = Window.partitionBy("table_name", "col_name").orderBy("arrival")
    prev_max = F.max("frequency").over(w.rowsBetween(Window.unboundedPreceding, -1))
    improved = (
        F.col("frequency") > F.coalesce(prev_max, F.lit(0.0))
    ) & (F.col("frequency") > 0.0)
    tagged = classified.withColumn("_improved", improved)

    improvements = tagged.where(F.col("_improved"))
    winners = improvements.groupBy("table_name", "fqn", "col_name", "ordinal_pos").agg(
        F.max_by(F.col("domain"), F.struct("frequency", (-F.col("arrival")).alias("neg"))).alias("domain"),
        F.max("frequency").alias("frequency"),
        F.array_sort(
            F.collect_list(F.struct("arrival", F.col("domain").alias("id"), "frequency"))
        ).alias("_sd"),
    ).withColumn(
        "semantic_domains",
        F.transform(F.col("_sd"), lambda s: F.struct(s["id"].alias("id"), s["frequency"].alias("frequency"))),
    ).drop("_sd")

    all_cols = classified.select("table_name", "fqn", "col_name", "ordinal_pos").distinct()
    return all_cols.join(
        winners, ["table_name", "fqn", "col_name", "ordinal_pos"], "left"
    )


def discovery_json(discovery: DataFrame) -> DataFrame:
    """Per-table nested output, the ``pg_discovery_col_data`` attribute:
    one row per table with the ``{"metadata":{"columns":[...]}}`` JSON
    string. Column order is ordinalPos (deterministic; the reference
    iterates a HashMap, which has no stable order to preserve)."""
    cols = discovery.groupBy("table_name", "fqn").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ordinal_pos",
                    F.struct(
                        F.col("col_name").alias("name"),
                        "domain",
                        "frequency",
                        F.col("semantic_domains").alias("semanticDomains"),
                    ).alias("c"),
                )
            )
        ).alias("_oc")
    )
    return cols.select(
        "table_name",
        "fqn",
        F.to_json(
            F.struct(
                F.struct(
                    F.transform(F.col("_oc"), lambda x: x["c"]).alias("columns")
                ).alias("metadata")
            )
        ).alias("pg_discovery_col_data"),
    )
