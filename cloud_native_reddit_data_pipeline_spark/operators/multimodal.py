"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages.  The actual codec work is STUBBED
(no media libraries in this container) behind `DECODERS` — each stub is
deterministic so the Spark-side plumbing (schema, batching, partition
behavior) is fully testable.  Swapping in PIL/ffmpeg later changes only
the stub body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: hashes payload
    bytes into a fixed-dim float vector.  Replace with a real model;
    the mapInPandas contract stays identical."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [round(a / 997.0, 6) for a in acc]


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes are
    a function of media_id)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(32 + (i % 5) * 8))
        rows.append(
            (
                i,
                modality,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 + i % 8 if modality != "audio" else None,
                64 + i % 4 if modality != "audio" else None,
                1000 * (1 + i % 30) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: binary payload -> array<float>.

    Arrow moves each partition in columnar batches; the decoder is
    initialized once per partition (executor-singleton pattern), which
    is the 100-TB-correct shape for heavyweight codecs/models."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # decoder init would happen HERE, once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": pdf["payload"].map(_fake_decode_features),
                }
            )

    return media.mapInPandas(_extract, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video into frame
    timestamps (native `sequence`+`explode`); the per-frame decode is the
    stubbed NotImplementedError below.  Demonstrates that the expensive
    fan-out (1 row -> N frames) happens JVM-side before any Python."""
    frames = media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


def decode_frame(payload: bytes, frame_ts_ms: int):  # pragma: no cover - stub
    """Real frame decode requires ffmpeg/PIL — not in this container."""
    raise NotImplementedError("media decode stubbed: no codec libraries in container")
