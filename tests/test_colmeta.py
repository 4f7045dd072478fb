"""ColMetadata envelope parity tests.

Mirrors the reference's chained-classifier flow
(PontusDiscoveryRegexDBClassifierProcessorTest.java:39-116: an email-regex
classifier, then a CPF-regex classifier, then dictionary classifiers, all
over ``col_metadata_table4/7.json``-shaped envelopes) and the upsert
semantics of PontusDiscoveryDBClassifierProcessor.java:200-286.  Also
covers the small processor-base operators added in round 2: P1 input
precedence, P2 probability-threshold filter, T2 entity limit, and the
S8/P6 raw-dictionary shape dispatch with its single-value NaN edge.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from nifi_nlp_processor_spark.functions.colmeta import (
    classify_dict,
    classify_regex,
    discovery_json,
    parse_col_metadata,
    upsert_discovery,
)
from nifi_nlp_processor_spark.functions.dictionary import (
    dictionary_from_raw,
    parse_raw_dictionary,
)
from nifi_nlp_processor_spark.functions.extractors import (
    full_match,
    input_precedence,
    limit_entities,
    threshold_filter,
)

# The reference test's two regex classifiers, verbatim
# (PontusDiscoveryRegexDBClassifierProcessorTest.java:47-51). rlike runs
# the JVM regex engine — the same dialect the reference compiles.
EMAIL_RE = (
    "(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\\.[a-z0-9!#$%&'*+/=?^_`{|}~-]+)*|\""
    "(?:[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f\\x21\\x23-\\x5b\\x5d-\\x7f]|\\\\"
    "[\\x01-\\x09\\x0b\\x0c\\x0e-\\x7f])*\")@(?:(?:[a-z0-9](?:[a-z0-9-]*"
    "[a-z0-9])?\\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?|\\[(?:(?:25[0-5]|2[0-4]"
    "[0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|"
    "[a-z0-9-]*[a-z0-9]:(?:[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f\\x21-\\x5a"
    "\\x53-\\x7f]|\\\\[\\x01-\\x09\\x0b\\x0c\\x0e-\\x7f])+)\\])"
)
CPF_RE = "^([-\\.\\s]?(\\d{3})){3}[-\\.\\s]?(\\d{2})$"


def _envelope():
    """A col_metadata_table7-shaped envelope: pk ids, CPF values (7/10 in
    the dotted format the CPF regex full-matches), first names, emails."""
    cols = [
        ("emp_no", 1, ["10001", "10002", "10003", "10004", "10005",
                       "10006", "10007", "10008", "10009", "10010"]),
        ("CPF", 2, ["008.920.406-96", "02977824871", "946.242.371-70",
                    "670.105.749-79", "125.889.126-30", "34684518493",
                    "88600386268", "218.979.248-79", "466.959.870-84",
                    "575.198.739-00"]),
        ("first_name", 3, ["georgi", "bezalel", "parto", "chirstian",
                           "kyoichi", "anneke", "tzvetan", "saniya",
                           "duangkaew", "mary"]),
        ("email", 4, ["georgi@example.com", "bezalel@test.org",
                      "parto@mail.net", "not-an-email", "kyoichi@x.io",
                      "anneke@y.co", "tzvetan@z.dev", "saniya@a.br",
                      "duangkaew@b.uk", "mary@c.us"]),
    ]
    return {
        "colMetaData": [
            {"colName": f" {name} " if name == "CPF" else name,
             "ordinalPos": pos, "vals": vals}
            for name, pos, vals in cols
        ],
        "tableName": "employees",
        "fqn": "employees.employees",
    }


@pytest.fixture(scope="module")
def discovery(spark):
    env = spark.createDataFrame(
        [(json.dumps(_envelope()),)], "pg_rdb_col_metadata string"
    )
    samples = parse_col_metadata(env)
    names = spark.createDataFrame(
        [("georgi",), ("bezalel",), ("parto",), ("chirstian",), ("kyoichi",),
         ("anneke",), ("tzvetan",), ("saniya",), ("duangkaew",)],
        "value string",
    )
    # Chained exactly like the reference test: email regex → CPF regex →
    # names dictionary. Arrival order = chain position.
    passes = [
        classify_regex(samples, EMAIL_RE, "Object.Email.Address", 1),
        classify_regex(samples, CPF_RE, "Person.Identity.ID", 2),
        classify_dict(samples, names, "Person.Natural.Name", 3, mode="analyzed"),
    ]
    classified = passes[0]
    for p in passes[1:]:
        classified = classified.unionByName(p)
    return upsert_discovery(classified)


def test_parse_trims_col_names(spark, discovery):
    # " CPF " in the envelope, trimmed on parse (ref :180)
    assert sorted(
        r.col_name for r in discovery.select("col_name").distinct().collect()
    ) == ["CPF", "email", "emp_no", "first_name"]


def test_chained_winners(discovery):
    winners = {r.col_name: (r.domain, r.frequency) for r in discovery.collect()}
    # CPF: separators in the regex are optional, so dotted AND bare
    # 11-digit values all full-match — 10/10
    assert winners["CPF"] == ("Person.Identity.ID", 100.0)
    # email: 9/10 valid addresses
    assert winners["email"] == ("Object.Email.Address", 90.0)
    # first_name: 9/10 in the names dictionary (mary absent)
    assert winners["first_name"] == ("Person.Natural.Name", 90.0)
    # emp_no matches nothing: entry present, winner fields withheld
    # (ref :221-229 — first writer creates the entry only with freq > 0)
    assert winners["emp_no"] == (None, None)


def test_semantic_domains_strictly_improving(discovery):
    # email column: CPF pass (0.0) and names pass (0.0) never improve on
    # the email pass (90.0) → semanticDomains holds only the winner
    row = discovery.where(F.col("col_name") == "email").collect()[0]
    assert [s["id"] for s in row.semantic_domains] == ["Object.Email.Address"]


def test_tie_keeps_incumbent(spark):
    # Two passes with identical frequency: strict `<` replacement means
    # the later arrival must NOT displace the winner (ref :253-273).
    classified = spark.createDataFrame(
        [("t", "f", "c", 1, 50.0, "first", 1), ("t", "f", "c", 1, 50.0, "second", 2)],
        "table_name string, fqn string, col_name string, ordinal_pos long, "
        "frequency double, domain string, arrival int",
    )
    row = upsert_discovery(classified).collect()[0]
    assert row.domain == "first"
    assert [s["id"] for s in row.semantic_domains] == ["first"]


def test_semantic_domains_prefix_maxima(spark):
    # Frequencies 30 → 10 → 60: the 10 never improves, so it is absent
    # from semanticDomains; winner is the 60.
    classified = spark.createDataFrame(
        [("t", "f", "c", 1, 30.0, "a", 1), ("t", "f", "c", 1, 10.0, "b", 2),
         ("t", "f", "c", 1, 60.0, "d", 3)],
        "table_name string, fqn string, col_name string, ordinal_pos long, "
        "frequency double, domain string, arrival int",
    )
    row = upsert_discovery(classified).collect()[0]
    assert row.domain == "d" and row.frequency == 60.0
    assert [s["id"] for s in row.semantic_domains] == ["a", "d"]


def test_discovery_json_nested_output(discovery):
    out = discovery_json(discovery).collect()
    assert len(out) == 1
    doc = json.loads(out[0].pg_discovery_col_data)
    cols = doc["metadata"]["columns"]
    assert [c["name"] for c in cols] == ["emp_no", "CPF", "first_name", "email"]
    cpf = cols[1]
    assert cpf["domain"] == "Person.Identity.ID"
    assert cpf["frequency"] == 100.0
    assert cpf["semanticDomains"] == [{"id": "Person.Identity.ID", "frequency": 100.0}]
    # zero-match column: name only (nulls dropped by to_json)
    assert cols[0] == {"name": "emp_no"}


# --- S8/P6: raw-dictionary shape dispatch --------------------------------

def test_raw_dict_shape_dispatch(spark):
    df = spark.createDataFrame(
        [('["a", "b", "a"]',), ("x\ny\n\n",), ("bare-single-value",)],
        "raw string",
    )
    got = {r.raw: r.vals for r in df.select(
        "raw", parse_raw_dictionary(F.col("raw")).alias("vals")).collect()}
    assert got['["a", "b", "a"]'] == ["a", "b", "a"]
    # Java String.split drops trailing empties
    assert got["x\ny\n\n"] == ["x", "y"]
    # the reader's single-value edge: ZERO candidates
    # (PontusLuceneIndexReaderProcessor.java:152-171 → found/total = 0/0)
    assert got["bare-single-value"] == []


def test_raw_dict_single_value_nan_edge(spark):
    """The promised P6 regression: a bare single value yields zero
    candidates, so the reader's percentage is 0/0 ⇒ NaN. Spark's avg over
    zero rows is NULL; we assert the division form reproduces NaN exactly
    as the reference's double arithmetic does."""
    df = spark.createDataFrame([("bare",)], "raw string")
    cands = df.select(F.explode(parse_raw_dictionary(F.col("raw"))).alias("value"))
    row = cands.agg(
        (F.sum(F.when(F.col("value") == "bare", 1).otherwise(0))
         / F.count("*") * 100.0).alias("pct")
    ).collect()[0]
    assert row.pct is None or row.pct != row.pct  # 0/0: NULL or NaN


def test_dictionary_from_raw_modes(spark):
    raw = spark.createDataFrame([("José\nmaria\nJOSÉ\n",)], "raw string")
    analyzed = {r.value for r in dictionary_from_raw(raw, mode="analyzed").collect()}
    exact = {r.value for r in dictionary_from_raw(raw, mode="exact").collect()}
    assert analyzed == {"jose", "maria"}
    assert exact == {"José", "maria", "JOSÉ"}


# --- P1 / P2 / T2 --------------------------------------------------------

def test_input_precedence(spark):
    df = spark.createDataFrame(
        [("attr", "content"), (None, "content2")],
        "data_to_parse string, text string",
    )
    got = [r.v for r in df.select(
        input_precedence(F.col("data_to_parse"), None, "text").alias("v")
    ).collect()]
    assert got == ["attr", "content2"]
    # property stage sits between attribute and content
    got2 = [r.v for r in df.select(
        input_precedence(F.col("data_to_parse"), "prop", "text").alias("v")
    ).collect()]
    assert got2 == ["attr", "prop"]


def test_threshold_filter_strict(spark):
    ents = [
        {"value": "a", "prob": 0.0},
        {"value": "b", "prob": 0.5},
        {"value": "c", "prob": 0.9},
    ]
    df = spark.createDataFrame(
        [(ents,)], "entities array<struct<value:string, prob:double>>"
    )
    # default threshold -0.01 keeps everything, including prob 0.0
    kept = df.select(threshold_filter(F.col("entities")).alias("e")).collect()[0].e
    assert [x.value for x in kept] == ["a", "b", "c"]
    # strict `>`: a span at exactly the threshold is dropped
    # (PontusProcessorBase.java:69-83)
    kept = df.select(
        threshold_filter(F.col("entities"), 0.5).alias("e")
    ).collect()[0].e
    assert [x.value for x in kept] == ["c"]


def test_limit_entities(spark):
    df = spark.createDataFrame([(list(range(300)),)], "entities array<int>")
    got = df.select(limit_entities(F.col("entities")).alias("e")).collect()[0].e
    assert got == list(range(250))


def test_enrich_entities_pipeline(spark):
    """The shared E1–E5 orchestration: precedence → backend → cap →
    threshold → set-union merge, with a pre-existing result column
    preserved (the WEIRD_VALUE check of PontusNLPProcessorTest.java:107)."""
    from nifi_nlp_processor_spark.functions.extractors import (
        enrich_entities,
        regex_span_backend,
    )

    df = spark.createDataFrame(
        [("a@b.co and c@d.io", ["WEIRD_VALUE_GOES_HERE"]),
         ("no emails here", None)],
        "text string, pg_nlp_res_email array<string>",
    )
    out = enrich_entities(
        df, {"email": regex_span_backend("[a-z]+@[a-z.]+[a-z]")}
    )
    rows = {r.text: r.pg_nlp_res_email for r in out.collect()}
    assert rows["a@b.co and c@d.io"] == ["WEIRD_VALUE_GOES_HERE", "a@b.co", "c@d.io"]
    assert rows["no emails here"] == []


def test_enrich_entities_threshold_and_cap(spark):
    """A probabilistic backend: spans at prob 0.3/0.7; threshold 0.5 keeps
    only the 0.7 span; a cap of 1 applied BEFORE the threshold keeps the
    first span only (the Watson request-side limit)."""
    from pyspark.sql import Column
    from nifi_nlp_processor_spark.functions.extractors import enrich_entities

    def fake_backend(data: Column) -> Column:
        return F.array(
            F.struct(F.lit("lo").alias("value"), F.lit(0.3).alias("prob")),
            F.struct(F.lit("hi").alias("value"), F.lit(0.7).alias("prob")),
        )

    df = spark.createDataFrame([("x",)], "text string")
    out = enrich_entities(df, {"ent": fake_backend}, threshold=0.5)
    assert out.collect()[0].pg_nlp_res_ent == ["hi"]
    capped = enrich_entities(df, {"ent": fake_backend}, threshold=-0.01, limit=1)
    assert capped.collect()[0].pg_nlp_res_ent == ["lo"]


def test_full_match_anchored(spark):
    df = spark.createDataFrame(
        [("123",), ("a123b",), ("12",)], "value string"
    )
    got = [r.m for r in df.select(
        full_match(F.col("value"), "[0-9]{3}").alias("m")).collect()]
    # find-all would hit inside "a123b"; full match must not
    assert got == [True, False, False]


def test_dictionary_from_file_and_persistence(spark, tmp_path):
    """S4 file scan + S8 persisted dict store: newline file → dictionary;
    append-mode writes accumulate per-domain partitions; a domain-filtered
    load prunes to that domain and reads the union of appends as a set."""
    from nifi_nlp_processor_spark.functions.dictionary import (
        dictionary_from_file,
        load_dictionary,
        membership,
        save_dictionary,
    )

    f = tmp_path / "names.txt"
    f.write_text("José\n\n maria \nJOSÉ\n")
    dic = dictionary_from_file(spark, str(f), mode="analyzed")
    assert {r.value for r in dic.collect()} == {"jose", "maria"}

    store = str(tmp_path / "dict_store")
    save_dictionary(dic.withColumn("domain", F.lit("names")), store)
    save_dictionary(
        spark.createDataFrame([("london", "cities"), ("maria", "names")],
                              "value string, domain string"),
        store,
    )
    names = load_dictionary(spark, store, domain="names")
    assert {r.value for r in names.collect()} == {"jose", "maria"}
    assert {r.domain for r in load_dictionary(spark, store).collect()} == {"names", "cities"}

    probed = membership(
        spark.createDataFrame([("José",), ("pierre",)], "value string"),
        names, mode="analyzed",
    )
    assert {(r.value, r.matched) for r in probed.collect()} == {("José", True), ("pierre", False)}
