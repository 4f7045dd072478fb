"""Multimodal column plumbing: binary payloads, typed metadata, Arrow-batched
feature extraction with the stubbed codec seam (fake decoder, real plumbing).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nifi_nlp_processor_spark.functions.multimodal import (
    decode_image,
    extract_media_features,
    fake_image_codec,
    media_summary,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark.range(0, 60).withColumnRenamed("id", "doc_id"))
    df = df.cache()
    yield df
    df.unpersist()


def test_schema_and_determinism(media):
    row = media.where(F.col("doc_id") == 7).first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert len(row["payload"]) == 64  # two sha256 digests
    again = media.sparkSession.range(7, 8).withColumnRenamed("id", "doc_id")
    row2 = synth_media(again).first()
    assert bytes(row["payload"]) == bytes(row2["payload"])
    assert row["media"]["mime"] in ("image/png", "audio/wav", "video/mp4")


def test_codec_seam_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_feature_extraction_matches_local_codec(media):
    out = extract_media_features(media).select("doc_id", "payload", "features")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 60
    for doc_id, r in list(rows.items())[:10]:
        payload = bytes(r["payload"])
        f = r["features"]
        assert f["content_sha256"] == hashlib.sha256(payload).hexdigest()
        assert f["n_bytes"] == 64
        expect = fake_image_codec(payload)
        assert f["mean_luma"] == pytest.approx(expect["mean_luma"])
        assert f["edge_density"] == pytest.approx(expect["edge_density"])


def test_frame_sampling_plan(media):
    frames = sample_frames(media, every_n=10)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    meta = {
        r["doc_id"]: r["media"]["n_frames"]
        for r in media.where(F.col("media.mime") == "video/mp4").collect()
    }
    assert len(got) == len(meta) > 0
    for r in got:
        n_frames = meta[r["doc_id"]]
        assert r["n"] == (n_frames - 1) // 10 + 1


def test_metadata_rollup_prunes_payload(media, tmp_path):
    """The per-mime rollup over a parquet media table must not read the
    payload column (columnar pruning — the point of keeping media opaque)."""
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    df = media.sparkSession.read.parquet(path)
    agg = media_summary(df)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines and all("payload" not in l for l in scan_lines)
    counts = {r["mime"]: r["n_items"] for r in agg.collect()}
    assert sum(counts.values()) == 60
