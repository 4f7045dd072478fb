"""Extractor parity tests vs reference semantics (SURVEY §5.2 #3).

Golden behaviors from PontusNLPProcessor.java:97-105 (default registry),
:437-492 (group 1..n rule), PontusProcessorBase.java:303-327 (set-union
merge preserving pre-existing values — the WEIRD_VALUE test,
PontusNLPProcessorTest.java:107)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nifi_nlp_processor_spark.functions.extractors import (
    DEFAULT_REGISTRY,
    compile_registry,
    extract_entities,
    extract_entities_sql,
    translate_java_regex,
)

TEXT = (
    "Hi, mail me at Alice.Smith@Example.org or bob+x@test.io.\n"
    "Docs: https://docs.example.com/a/b?q=1 and ftp://files.example.net/x\n"
    "Call +44 20 7946 0958 now. Card: x4111 1111 1111 1111x end\n"
    "Follow @Spark_User1 please. Postcode SW1A 1AA here.\n"
    "Address of record: 10 Downing St, London"
)


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame([(1, TEXT)], "id int, text string")
    out = extract_entities(df).collect()[0].asDict()
    return out


def test_registry_compiles():
    pats = compile_registry(DEFAULT_REGISTRY)
    assert set(pats) == {"email", "URL", "phone", "cred_card", "twitterHandle", "post_code", "address"}


def test_java_dialect_translation():
    assert translate_java_regex(r"[a-z\x{00a1}-\x{ffff}]") == r"[a-z¡-￿]".replace(
        "¡", "\\u00a1"
    ).replace("￿", "\\uffff")
    # and the escape actually compiles to the right range in Python re
    import re

    assert re.match(translate_java_regex(r"[\x{00a1}-\x{ffff}]"), "¡")


def test_email_and_case_insensitive(extracted):
    # Java compiles CASE_INSENSITIVE: mixed-case emails match
    assert "Alice.Smith@Example.org" in extracted["pg_nlp_res_email"]
    assert "bob+x@test.io" in extracted["pg_nlp_res_email"]


def test_url(extracted):
    urls = extracted["pg_nlp_res_url"]
    assert any(u.startswith("https://docs.example.com/a/b") for u in urls)
    assert any(u.startswith("ftp://files.example.net") for u in urls)


def test_phone(extracted):
    assert "+44 20 7946 0958" in extracted["pg_nlp_res_phone"]


def test_cred_card_lookbehind(extracted):
    # lookbehind/lookahead pattern: digits+separators between non-digit anchors
    assert any("4111" in v for v in extracted["pg_nlp_res_cred_card"])


def test_group_rule_twitter_handle(extracted):
    # pattern has a capture group → group 1 only (no leading @), never group 0
    assert "Spark_User1" in extracted["pg_nlp_res_twitterhandle"]
    assert all(not v.startswith("@") for v in extracted["pg_nlp_res_twitterhandle"])


def test_group_rule_address(extracted):
    # 'Address.*:(.*)$' keeps only the capture
    assert extracted["pg_nlp_res_address"] == [" 10 Downing St, London"]


def test_post_code(extracted):
    assert "SW1A 1AA" in extracted["pg_nlp_res_post_code"]


def test_set_union_merge_preserves_existing(spark):
    """The WEIRD_VALUE attribute-preservation golden
    (PontusNLPProcessorTest.java:107)."""
    df = spark.createDataFrame(
        [(1, "ping @realuser ok")], "id int, text string"
    ).withColumn("pg_nlp_res_twitterhandle", F.array(F.lit("WEIRD_VALUE_GOES_HERE")))
    out = extract_entities(df).collect()[0].asDict()
    assert set(out["pg_nlp_res_twitterhandle"]) == {"WEIRD_VALUE_GOES_HERE", "realuser"}


def test_sql_variant_matches_pandas(spark):
    """JVM regexp_extract_all path agrees with the parity path on the
    dialect-safe subset of the registry."""
    sub = {k: DEFAULT_REGISTRY[k] for k in ("email", "phone", "twitterHandle")}
    rows = [
        (1, "a@b.co and C@d.org plus @handle_1"),
        (2, "call +1 555 000 1111 or +44 20 7946 0958"),
        (3, None),
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    a = {r["id"]: r.asDict() for r in extract_entities(df, sub).collect()}
    b = {r["id"]: r.asDict() for r in extract_entities_sql(df, sub).collect()}
    for i in a:
        for k in ("pg_nlp_res_email", "pg_nlp_res_phone", "pg_nlp_res_twitterhandle"):
            av = sorted(a[i][k] or [])
            bv = sorted(b[i][k] or [])
            assert av == bv, (i, k, av, bv)


def test_idempotent_double_extraction(spark):
    """Running the extractor twice is a no-op (set-union semantics, A2)."""
    df = spark.createDataFrame([(1, TEXT)], "id int, text string")
    once = extract_entities(df).collect()[0].asDict()
    twice = extract_entities(extract_entities(df)).collect()[0].asDict()
    for k in once:
        if k.startswith("pg_nlp_res_"):
            assert sorted(once[k]) == sorted(twice[k])
