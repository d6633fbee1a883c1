"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side architecture is real and tested — schema, partitioning,
Arrow-batched ``mapInPandas`` signatures, deterministic frame/sample
selection — while the codec step itself is STUBBED (this container has no
image/audio libraries).  Set ``use_real_codecs=True`` to get an explicit
``NotImplementedError`` at the exact point a real decoder (Pillow/ffmpeg)
would plug in; the default fake decoder is deterministic over the payload
bytes so pipelines are testable end-to-end.

At scale: payloads stay columnar (parquet binary), decode happens inside
executors in Arrow batches, and all metadata math (frame timestamps,
sample offsets) is JVM-side Column arithmetic.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _decode_image_stub(payload: bytes, use_real_codecs: bool) -> dict:
    """STUB decode step.  A real implementation would be
    ``PIL.Image.open(io.BytesIO(payload))``; this container has no codecs,
    so the fake is a deterministic function of the bytes."""
    if use_real_codecs:
        raise NotImplementedError(
            "real image decode requires Pillow/libvips — not available in "
            "this environment; plug the decoder in here"
        )
    return {
        "sha256": hashlib.sha256(payload).hexdigest(),
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
    }


def image_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over image payloads.

    ``mapInPandas`` so each task processes whole Arrow record batches;
    payloads never transit the driver.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_stub(p, use_real_codecs) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": [f["sha256"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                }
            )

    from nlp_to_nosql_spark.plans.partitioning import fan_out

    return (
        fan_out(media.filter(F.col("kind") == "image").select("media_id", "payload", "meta"))
        .mapInPandas(extract, IMAGE_FEATURE_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Deterministic frame-sampling plan for videos: one timestamp per
    1/fps seconds of duration.  Pure Column arithmetic (no decode) — the
    downstream decode would consume (media_id, frame_ms) pairs.
    """
    step_ms = int(1000 / fps)
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(step_ms),
                )
            ).alias("frame_ms"),
        )
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Chunking plan for audio payloads: (media_id, chunk_start_ms,
    chunk_len_ms) windows covering the duration."""
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("meta.duration_ms").alias("duration_ms"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(chunk_ms),
                )
            ).alias("chunk_start_ms"),
        )
        .withColumn(
            "chunk_len_ms",
            F.least(F.lit(chunk_ms), F.col("duration_ms") - F.col("chunk_start_ms")),
        )
        .drop("duration_ms")
    )
