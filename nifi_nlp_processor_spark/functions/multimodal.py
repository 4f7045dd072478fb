"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference is text-only (FlowFile content read as UTF-8,
PontusProcessorBase.java:246-259), but its *shape* — opaque content plus an
attribute map, enriched per record and routed success/failure — generalizes
directly to binary payloads. A 100 TB training-data pipeline carries media
columns; this module supplies the Spark-side plumbing:

* **Schema**: ``payload: binary`` + a typed ``media: struct`` metadata column
  (mime, width, height, duration_ms, sample_rate, n_frames). Binary stays
  opaque to Catalyst; all pruning happens on the metadata struct, so a query
  that filters on ``media.mime`` never deserializes payloads it drops
  (parquet column pruning — the payload column is simply not read).
* **Execution**: decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` stages. Batches are bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB payloads
  set it low (e.g. 64) so a batch fits executor memory; the functions here
  are per-batch streaming iterators and never hold more than one batch.
* **Stubbed codecs**: the real decoders (PIL/libav) are not in this
  container. Each codec hook is a clearly-marked seam: ``decode_image``
  raises ``NotImplementedError`` unless handed a ``codec=`` callable, and
  the deterministic fake codec (``fake_image_codec``) derives pixel stats
  from a hash of the payload bytes — real plumbing (schema, batching,
  partitioning, signatures) with fake leaf math, so the pipeline is testable
  end-to-end and a real codec drops in without touching the Spark side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("edge_density", T.DoubleType()),
    ]
)


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic media rows derived from an id column: an
    opaque binary payload (hash-expanded bytes, JVM-side — no Python) plus
    plausible typed metadata. Stand-in for reading a real lake table with
    ``payload: binary``."""
    payload = F.to_binary(
        F.concat(
            F.sha2(F.col(id_col).cast("string"), 256),
            F.sha2(F.concat(F.col(id_col).cast("string"), F.lit("x")), 256),
        ),
        F.lit("hex"),
    )
    mod = F.pmod(F.col(id_col), F.lit(3))
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
                (mod + 1).cast("int"),
            ).alias("mime"),
            (F.pmod(F.col(id_col) * 7, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.col(id_col) * 13, F.lit(1080)) + 1).cast("int").alias("height"),
            F.when(mod != 0, F.pmod(F.col(id_col) * 31, F.lit(600_000))).cast("long").alias("duration_ms"),
            F.when(mod == 1, F.lit(16_000)).cast("int").alias("sample_rate"),
            F.when(mod == 2, (F.pmod(F.col(id_col), F.lit(900)) + 30)).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def fake_image_codec(payload: bytes) -> dict:
    """Deterministic fake decode: stats derived from the payload digest.
    Replace with a PIL/numpy decoder in deployment; the signature is the
    contract (payload bytes in, scalar feature dict out)."""
    d = hashlib.sha256(payload).digest()
    return {
        "mean_luma": d[0] / 255.0,
        "edge_density": d[1] / 255.0,
    }


def decode_image(payload: bytes, codec: Callable[[bytes], dict] | None = None) -> dict:
    """Codec seam. The container has no image libraries; a real deployment
    passes ``codec=pil_codec``."""
    if codec is None:
        raise NotImplementedError(
            "no image codec available in this environment; pass codec= "
            "(tests use fake_image_codec)"
        )
    return codec(payload)


def extract_media_features(
    df: DataFrame,
    codec: Callable[[bytes], dict] = fake_image_codec,
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Output adds a ``features`` struct. The UDF streams batches — memory is
    one Arrow batch of payloads, independent of partition size — and the
    stage receives only the columns it reads (Catalyst prunes the rest out
    of the parquet scan)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", FEATURE_SCHEMA)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                stats = decode_image(b, codec=codec)
                feats.append(
                    {
                        "content_sha256": hashlib.sha256(b).hexdigest(),
                        "n_bytes": len(b),
                        "mean_luma": stats["mean_luma"],
                        "edge_density": stats["edge_density"],
                    }
                )
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(fn, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling *plan* for video rows: one output row per sampled
    frame index, computed declaratively from metadata (``sequence`` +
    ``explode``) — the expensive per-frame decode happens only in a
    downstream mapInPandas stage, and only for rows this plan kept."""
    vids = df.where(F.col("media.mime").startswith("video/"))
    return vids.select(
        F.col(id_col),
        F.col("payload"),
        F.explode(
            F.sequence(
                F.lit(0), F.col("media.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def media_summary(df: DataFrame) -> DataFrame:
    """Per-mime rollup over metadata only — demonstrates that analytic
    queries on media tables never touch the payload column (check the scan's
    ReadSchema: ``payload`` is absent)."""
    return df.groupBy(F.col("media.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.coalesce(F.col("media.duration_ms"), F.lit(0))).alias("total_duration_ms"),
        F.max(F.col("media.width") * F.col("media.height")).alias("max_pixels"),
    )
