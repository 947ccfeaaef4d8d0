"""Multimodal columns: binary payloads + typed metadata, Spark-side plumbing.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched pandas functions via
mapInPandas. The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic hash-derived feature vector
stands in — the Spark-side schema, batching, partitioning and UDF signatures
are real and tested; only the pixel math is fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a feature vector.

    Real decode requires an image library absent from this container ->
    NotImplementedError. ``fake=True`` derives a deterministic
    FEATURE_DIM-dim float vector from the payload bytes (md5-seeded), so the
    full distributed plumbing is exercisable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.md5(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / float(2**32)).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media rows) -> (media_id, kind, feature array<float>).

    mapInPandas so each Arrow batch is decoded in one Python call; output
    keeps the input partitioning (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if payload is None else decode_image(bytes(payload), fake=fake).tolist()
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) from
    the metadata duration — pure JVM-side sequence/explode; the decode of
    each frame is the stubbed step above."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def make_fake_media(spark, n: int) -> DataFrame:
    """Deterministic media table: payload bytes derived from the id."""
    i = F.col("id")
    payload = F.encode(F.format_string("media-payload-%d", i), "UTF-8")
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int")).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            ((i % 10 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
