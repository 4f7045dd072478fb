"""Dictionary membership / classifier parity (SURVEY §5.2 #3).

Reproduces the reference's golden PERCENTAGE_MATCH pattern 70.0 / 30.0 /
50.0 / 50.0 (PontusLuceneIndexWriterProcessorTest.java:90,148,201,258) on
equivalent synthetic fixtures, and the max-frequency LWW winner with
ties-keep-first (PontusDiscoveryDBClassifierProcessor.java:221-229,253-273).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nifi_nlp_processor_spark.functions.dictionary import (
    classify_columns,
    lww_domain_winner,
    membership,
    normalize_analyzed,
    percentage_match,
)

NAMES = ["silva", "santos", "oliveira", "souza", "costa", "pereira", "almeida"]
CITIES = ["lisboa", "porto", "braga", "coimbra", "faro", "evora", "aveiro"]


@pytest.fixture(scope="module")
def dictionaries(spark):
    rows = [("Person.Identity.Last_Name", v, "analyzed") for v in NAMES] + [
        ("Location.Address.City", v, "analyzed") for v in CITIES
    ]
    return spark.createDataFrame(rows, "domain string, value string, mode string").cache()


def _samples(spark, col_name, values):
    return spark.createDataFrame([(col_name, v) for v in values], "col_name string, value string")


def test_percentage_70_names(spark, dictionaries):
    # 10 candidates, 7 of which are names → 70.0 (golden: writer test :90)
    cands = _samples(spark, "last_name", NAMES + ["zzz1", "zzz2", "zzz3"])
    dic = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    out = percentage_match(membership(cands, dic)).collect()
    assert out[0]["frequency"] == 70.0


def test_percentage_30_cities_as_names(spark, dictionaries):
    # 10 candidates, 3 names among cities → 30.0 (golden :148)
    cands = _samples(spark, "mixed", CITIES + NAMES[:3])
    dic = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    out = percentage_match(membership(cands, dic)).collect()
    assert out[0]["frequency"] == 30.0


def test_percentage_50_50(spark, dictionaries):
    # two 50.0 goldens (:201, :258)
    cands = _samples(spark, "half", NAMES[:5] + ["x1", "x2", "x3", "x4", "x5"])
    dic = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    assert percentage_match(membership(cands, dic)).collect()[0]["frequency"] == 50.0
    cands2 = _samples(spark, "half2", CITIES[:4] + ["q1", "q2", "q3", "q4"])
    dic2 = dictionaries.where(F.col("domain") == "Location.Address.City")
    assert percentage_match(membership(cands2, dic2)).collect()[0]["frequency"] == 50.0


def test_analyzed_normalization(spark, dictionaries):
    # TextField ≈ lowercase + accent fold: 'SILVA', ' Évora ' match
    cands = _samples(spark, "c", ["SILVA", " Évora ".replace("É", "É")])
    dic_n = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    m = membership(cands, dic_n).where(F.col("matched")).collect()
    assert [r["value"] for r in m] == ["SILVA"]
    dic_c = spark.createDataFrame([("d", "évora", "analyzed")], "domain string, value string, mode string")
    m2 = membership(_samples(spark, "c", ["EVORA"]), dic_c).collect()
    assert m2[0]["matched"] is True


def test_exact_mode_is_verbatim(spark, dictionaries):
    # StringField: no normalization, case mismatch → no match
    cands = _samples(spark, "c", ["SILVA", "silva"])
    dic = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    m = {r["value"]: r["matched"] for r in membership(cands, dic, mode="exact").collect()}
    assert m == {"SILVA": False, "silva": True}


def test_fuzzy_mode(spark, dictionaries):
    # the reader's '~%s' fuzzy query format → edit distance ≤ 2
    cands = _samples(spark, "c", ["silvaa", "zzzzzz"])
    dic = dictionaries.where(F.col("domain") == "Person.Identity.Last_Name")
    m = {r["value"]: r["matched"] for r in membership(cands, dic, fuzzy=True).collect()}
    assert m == {"silvaa": True, "zzzzzz": False}


def test_chained_classifier_lww_winner(spark, dictionaries):
    """Chained names→cities classifiers: max frequency wins; ties keep the
    first writer; zero-frequency probes never create an entry."""
    col_samples = spark.createDataFrame(
        [("surname", v) for v in NAMES + ["u1", "u2", "u3"]]  # 70% names
        + [("city", v) for v in CITIES + NAMES[:3]]  # 70% cities, 30% names
        + [("ids", v) for v in ["1", "2", "3", "4"]],  # 0% both
        "col_name string, value string",
    )
    c1 = classify_columns(col_samples, dictionaries, "Person.Identity.Last_Name").withColumn(
        "arrival", F.lit(0)
    )
    c2 = classify_columns(col_samples, dictionaries, "Location.Address.City").withColumn(
        "arrival", F.lit(1)
    )
    winners = {
        r["col_name"]: (r["domain"], r["frequency"])
        for r in lww_domain_winner(c1.unionByName(c2)).collect()
    }
    assert winners["surname"] == ("Person.Identity.Last_Name", 70.0)
    assert winners["city"] == ("Location.Address.City", 70.0)
    assert "ids" not in winners  # freq 0 creates no entry

    # tie: equal frequency in both domains → first arrival (names) keeps
    tie = spark.createDataFrame(
        [("t", v) for v in NAMES[:2] + CITIES[:2] + ["x1", "x2"]],
        "col_name string, value string",
    )
    t1 = classify_columns(tie, dictionaries, "Person.Identity.Last_Name").withColumn("arrival", F.lit(0))
    t2 = classify_columns(tie, dictionaries, "Location.Address.City").withColumn("arrival", F.lit(1))
    w = lww_domain_winner(t1.unionByName(t2)).collect()[0]
    assert w["domain"] == "Person.Identity.Last_Name"
    assert len(w["semantic_domains"]) == 2
