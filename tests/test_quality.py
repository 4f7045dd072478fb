"""Golden tests for the corpus-cleaning operators (functions/quality.py):
boilerplate line removal, Gopher repetition stats, PII redaction."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_nlp_processor_spark.functions.quality import (  # noqa: E402
    boilerplate_line_dedup,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_strips_frequent_lines_keeps_order(spark):
    boiler = "SUBSCRIBE NOW"
    rows = [(i, f"{boiler}\nunique body {i}\nmore body {i}") for i in range(5)]
    rows.append((99, "no boiler here"))
    out = {
        r["doc_id"]: r
        for r in boilerplate_line_dedup(_docs(spark, rows), min_doc_freq=5).collect()
    }
    assert out[0]["clean_text"] == "unique body 0\nmore body 0"
    assert out[0]["n_lines"] == 3 and out[0]["n_removed"] == 1
    assert out[99]["clean_text"] == "no boiler here"
    assert out[99]["n_removed"] == 0


def test_line_dedup_fully_boilerplate_doc_survives_empty(spark):
    rows = [(i, "only boiler") for i in range(4)]
    out = boilerplate_line_dedup(_docs(spark, rows), min_doc_freq=4).collect()
    assert len(out) == 4  # no rows silently dropped
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


def test_line_dedup_trims_before_matching(spark):
    # the same line with trailing spaces in some docs still counts as one
    rows = [(1, "FOOTER  \nbody a"), (2, "FOOTER\nbody b"), (3, "FOOTER \nbody c")]
    out = boilerplate_line_dedup(_docs(spark, rows), min_doc_freq=3).collect()
    assert all(r["n_removed"] == 1 for r in out)


def test_line_dedup_broadcasts_frequent_set(spark):
    rows = [(i, f"x\nbody {i}") for i in range(3)]
    plan = (
        boilerplate_line_dedup(_docs(spark, rows), min_doc_freq=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # never a shuffle join against the corpus


def test_repetition_flags_spam_run(spark):
    spam = (1, "real words here " + "spam " * 50 + "end")
    clean = (2, " ".join(f"w{i}" for i in range(100)))
    out = {r["doc_id"]: r for r in repetition_stats(_docs(spark, [spam, clean])).collect()}
    assert out[1]["is_repetitive"] is True
    assert out[1]["top_word_frac"] > 0.5
    assert out[2]["is_repetitive"] is False
    assert out[2]["distinct_word_frac"] == 1.0
    assert out[2]["top_bigram_frac"] == round(1.0 / 99, 6)


def test_repetition_single_word_doc_has_zero_bigram_frac(spark):
    out = repetition_stats(_docs(spark, [(1, "lonely")])).collect()[0]
    assert out["top_bigram_frac"] == 0.0
    assert out["n_words"] == 1 and out["top_word_frac"] == 1.0


def test_redact_pii_masks_and_counts(spark):
    rows = [(1, "mail a@b.com and c@d.org, call +4412345678 now")]
    out = redact_pii(
        _docs(spark, rows),
        {
            "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
            "phone": r"\+(?:[0-9] ?){6,14}[0-9]",
        },
    ).collect()[0]
    assert out["redacted"] == "mail [EMAIL] and [EMAIL], call [PHONE] now"
    assert out["n_email"] == 2 and out["n_phone"] == 1


def test_redact_pii_earlier_pattern_wins_overlap(spark):
    # '+digits' is a valid email local part, so the first-listed email
    # pattern consumes the whole token and the phone pattern sees nothing
    rows = [(1, "x +4412345678@host.com y")]
    pats = {
        "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
        "phone": r"\+(?:[0-9] ?){6,14}[0-9]",
    }
    out = redact_pii(_docs(spark, rows), pats).collect()[0]
    assert out["redacted"] == "x [EMAIL] y"
    assert out["n_email"] == 1 and out["n_phone"] == 0


def test_redact_pii_is_shuffle_free(spark):
    plan = (
        redact_pii(_docs(spark, [(1, "a@b.co")]), {"email": r"[a-z]+@[a-z.]+"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
