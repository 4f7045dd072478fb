"""Enrichment stage inside the CDC apply path (SURVEY §4.3 hot path): the
reference's per-record NER/regex pass (PontusNLPProcessor.java:331-492)
re-expressed as an Arrow-batched mapInPandas stage between quarantine and
LWW dedupe — plus the lineage/metrics export the north rule requires."""

from __future__ import annotations

import json
import re

from nifi_nlp_processor_spark.fixtures import ChangeStreamSpec, change_events
from nifi_nlp_processor_spark.functions.extractors import extract_entities
from nifi_nlp_processor_spark.lake import ParquetLakeTable
from nifi_nlp_processor_spark.oracle import replay
from nifi_nlp_processor_spark.runner import CdcEngine

REGISTRY = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "twitterHandle": r"\@([a-z0-9_]{1,15}\b)",
}

SPEC = ChangeStreamSpec(
    n_conversations=20, update_frac=0.3, update2_frac=0.1, delete_frac=0.15,
    dup_frac=0.1, out_of_order=True, n_epochs=3,
)


def test_enriched_apply_matches_oracle_plus_local_regex(spark, tmp_path):
    events = change_events(spark, SPEC).cache()
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    engine = CdcEngine(
        lake=lake,
        enrich=lambda df: extract_entities(df, REGISTRY),
    )
    engine.apply_epochs(events)

    state = replay([r.asDict() for r in events.collect()])
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in lake.read().collect()
    }
    assert set(rows) == set(state)

    pats = {k: re.compile(p, re.I | re.M) for k, p in REGISTRY.items()}
    checked = {"email": 0, "twitterHandle": 0}
    for key, want in state.items():
        got = rows[key]
        assert got["text"] == want["text"]  # per-turn text equality invariant
        for k, pat in pats.items():
            expect = sorted(
                {m.group(1) if pat.groups else m.group(0) for m in pat.finditer(want["text"] or "")}
            )
            assert list(got[f"pg_nlp_res_{k.lower()}"]) == expect, key
            checked[k] += bool(expect)
    # fixtures embed both entity kinds — the assertion above must have bitten
    assert all(n > 0 for n in checked.values())
    events.unpersist()


def test_lineage_export(spark, tmp_path):
    events = change_events(spark, SPEC).cache()
    lake = ParquetLakeTable(spark, str(tmp_path / "lake2"), n_buckets=8)
    engine = CdcEngine(lake=lake)
    engine.apply_epochs(events)

    lineage = engine.lineage()
    assert len(lineage) == SPEC.n_epochs
    applied = sum(e["inserted"] + e["updated"] for e in lineage)
    assert applied > 0
    for e in lineage:
        assert set(e) >= {"epoch_id", "rows_applied", "inserted", "updated",
                          "deleted", "stale", "watermarks", "buckets_touched"}
        assert e["buckets_touched"] > 0

    # watermarks are per-bucket maxima and monotone across epochs
    last = {}
    for e in lineage:
        for b, wm in e["watermarks"].items():
            assert wm >= last.get(b, -1)
            last[b] = wm

    out = tmp_path / "lineage.json"
    engine.save_lineage(str(out))
    assert json.loads(out.read_text()) == lineage
    events.unpersist()
