"""Multimodal column plumbing (beyond-reference, driver north star).

Images/audio/video ride through the pipeline as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the binary
payloads never round-trip through driver memory and partition sizing stays
byte-aware (``spark.sql.files.maxPartitionBytes``).

The actual codec work (JPEG decode, resampling, ffmpeg) needs libraries this
container doesn't ship — those steps are STUBBED: ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is injected. The
Spark-side contract — schemas, batch iteration, UDF signatures, partition
behavior — is real and tested.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# An asset row: opaque payload + typed metadata. The metadata struct is the
# queryable part (predicate pushdown works on it; the payload is only ever
# touched inside Arrow batches).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def default_image_decoder(payload: bytes) -> "object":
    """Real decode needs PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library; inject decoder= explicitly "
        "(tests use fake_decoder)"
    )


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in 'decoder': 8 float features derived from byte
    statistics. Lets the full pipeline run end-to-end in environments
    without codec libraries."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    return [
        float(n),
        payload[0] / 255.0,
        payload[-1] / 255.0,
        sum(payload) / (255.0 * n),
        min(payload) / 255.0,
        max(payload) / 255.0,
        payload[n // 2] / 255.0,
        float(sum(1 for b in payload if b == 0)) / n,
    ]


def extract_features(
    assets: DataFrame,
    decoder: Callable[[bytes], list[float]] = default_image_decoder,
    batch_limit: int = 256,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches, bounded
    per-batch row count so large payloads don't blow executor memory)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [
                    decoder(bytes(p)) if p is not None else None
                    for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"].values,
                        "feature": feats,
                        "n_bytes": [
                            len(p) if p is not None else 0 for p in chunk["payload"]
                        ],
                    }
                )

    return assets.select("asset_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video asset into frame
    timestamps (the decode of each frame is the stubbed step). Pure
    built-ins — sequence() explode — so the expansion is JVM-side."""
    videos = assets.filter(F.col("media_type") == "video")
    return videos.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter for tests/demos: wrap document texts as fake binary assets
    (utf-8 payloads, image metadata derived from length)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("utf8").alias("codec"),
        ).alias("meta"),
    )
