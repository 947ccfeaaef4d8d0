"""Multimodal columns: binary payloads + typed metadata, Spark-side plumbing.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched pandas functions via
mapInPandas.

PNG decode is REAL and stdlib-only: ``decode_png`` parses the chunk stream,
inflates IDAT with zlib, and un-applies the per-scanline filters
(None/Sub/Up/Average/Paeth) into an (h, w, channels) uint8 pixel array —
bit-depth-8, non-interlaced, color types 0/2/3/4/6 (the overwhelming web
majority). ``decode_image`` turns those pixels into a deterministic
FEATURE_DIM stats vector. Codec-dependent formats (JPEG entropy decode,
audio/video) remain STUBBED behind NotImplementedError (no codec libs in
this container); ``fake=True`` keeps the hash-derived stand-in for
plumbing-only tests and non-PNG payloads.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """REAL stdlib PNG decode: chunk parse -> zlib inflate -> scanline
    unfilter -> (h, w, channels) uint8 pixels (palette images expand to RGB).

    Scope: bit depth 8, non-interlaced — the dominant web-PNG shape;
    16-bit/interlaced/sub-byte depths raise NotImplementedError (route those
    to a codec library on a real deployment). Malformed streams raise
    ValueError. Deterministic: same bytes -> same pixels, everywhere.
    """
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG stream (bad magic)")
    pos, n = 8, len(payload)
    ihdr = plte = None
    idat: list[bytes] = []
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # 4 len + 4 type + data + 4 crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG compression/filter method {comp}/{filt}")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} not supported "
            "(stdlib tier decodes 8-bit non-interlaced only)"
        )
    channels = _PNG_CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        ftype = raw[p]
        cur = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up: uint8 wraparound add is the spec's mod-256
            cur += prev
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (int(cur[i]) + int(cur[i - channels])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(cur[i - channels]) if i >= channels else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    px = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
    return px


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a deterministic FEATURE_DIM feature vector.

    PNG payloads decode for REAL (``decode_png``) and yield pixel statistics:
    [log1p(w), log1p(h), n_channels, per-channel means (4 slots),
    per-channel stds (4 slots), 5-bin luma histogram] — all in [0, ~22],
    deterministic across runs and partitionings. Non-PNG payloads raise
    NotImplementedError (JPEG entropy decode needs a codec library this
    container lacks); ``fake=True`` derives an md5-seeded stand-in vector
    instead, keeping the distributed plumbing exercisable for any payload.
    """
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        return (raw.astype(np.float64) / float(2**32)).astype(np.float32)
    if payload and bytes(payload).startswith(_PNG_MAGIC):
        px = decode_png(bytes(payload)).astype(np.float64) / 255.0
        h, w, c = px.shape
        flat = px.reshape(-1, c)
        feat = np.zeros(FEATURE_DIM, dtype=np.float64)
        feat[0] = np.log1p(w)
        feat[1] = np.log1p(h)
        feat[2] = float(c)
        feat[3 : 3 + min(c, 4)] = flat.mean(axis=0)[:4]
        feat[7 : 7 + min(c, 4)] = flat.std(axis=0)[:4]
        luma = flat.mean(axis=1)
        hist, _ = np.histogram(luma, bins=5, range=(0.0, 1.0))
        feat[11:16] = hist / float(luma.size)
        return feat.astype(np.float32)
    raise NotImplementedError(
        "only PNG decodes without codec libraries (this container has none); "
        "pass fake=True for the deterministic stand-in on other formats"
    )


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG encoder: 8-bit gray/gray+alpha/RGB/RGBA pixels ->
    a spec-valid non-interlaced PNG, every scanline carrying ``filter_type``
    (0..4). Deterministic (fixed zlib settings); exists so fixtures and
    round-trip tests can produce REAL PNG payloads without codec libraries,
    and as the egress for pixel outputs."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = px.reshape(h, stride)
    lines: list[bytes] = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filtered = cur
        elif filter_type == 1:  # Sub
            filtered = cur.copy()
            filtered[c:] = cur[c:] - cur[:-c]
        elif filter_type == 2:  # Up (uint8 wraparound = the spec's mod 256)
            filtered = cur - prev
        elif filter_type == 3:  # Average
            filtered = np.empty(stride, np.uint8)
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                filtered[i] = (int(cur[i]) - ((left + int(prev[i])) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            filtered = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filtered[i] = (int(cur[i]) - pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {filter_type}")
        lines.append(bytes([filter_type]) + filtered.tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


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
