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


def sniff_media_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte container sniffing + header dimension parsing — REAL (not
    stubbed) and entirely JVM-side: ``substring``/``hex``/``conv`` on the
    binary column inside whole-stage codegen, no Python and no codec libs.

    Detects PNG / JPEG / GIF / RIFF-WAV / MP4(ftyp); parses pixel dimensions
    from the fixed-offset headers that carry them (PNG IHDR big-endian at
    byte 17; GIF logical screen little-endian at byte 7). Codec-dependent
    formats (JPEG SOF scan) are left null for the decode stage — sniffing is
    the cheap corpus-wide pass that routes payloads to per-format decoders.
    """
    p = F.col(payload_col)

    def be32(offset: int):  # 4 bytes big-endian -> long
        return F.conv(F.hex(F.substring(p, offset, 4)), 16, 10).cast("long")

    def le16(offset: int):  # 2 bytes little-endian -> long
        lo = F.conv(F.hex(F.substring(p, offset, 1)), 16, 10).cast("long")
        hi = F.conv(F.hex(F.substring(p, offset + 1, 1)), 16, 10).cast("long")
        return hi * 256 + lo

    head4 = F.hex(F.substring(p, 1, 4))
    sniffed = (
        F.when(head4 == "89504E47", F.lit("image/png"))
        .when(F.hex(F.substring(p, 1, 3)) == "FFD8FF", F.lit("image/jpeg"))
        .when(F.substring(p, 1, 6).cast("string").isin("GIF87a", "GIF89a"), F.lit("image/gif"))
        .when(
            (F.substring(p, 1, 4).cast("string") == "RIFF")
            & (F.substring(p, 9, 4).cast("string") == "WAVE"),
            F.lit("audio/wav"),
        )
        .when(F.substring(p, 5, 4).cast("string") == "ftyp", F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
    )
    width = (
        F.when(sniffed == "image/png", be32(17))
        .when(sniffed == "image/gif", le16(7))
        .cast("int")
    )
    height = (
        F.when(sniffed == "image/png", be32(21))
        .when(sniffed == "image/gif", le16(9))
        .cast("int")
    )
    return media.withColumn(
        "sniffed",
        F.struct(
            sniffed.alias("mime"),
            width.alias("width"),
            height.alias("height"),
            F.length(p).alias("n_bytes"),
        ),
    )
