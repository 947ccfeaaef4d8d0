"""Multimodal columns: binary payloads + typed metadata, Spark-side plumbing.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched pandas functions via
mapInPandas.

PNG and WAV decode are REAL and stdlib-only: ``decode_png`` parses the
chunk stream, inflates IDAT with zlib, and un-applies the per-scanline
filters (None/Sub/Up/Average/Paeth) into an (h, w, channels) uint8 pixel
array — bit-depth-8, non-interlaced, color types 0/2/3/4/6 (the
overwhelming web majority); ``decode_wav`` walks the RIFF chunks into
float PCM samples (8/16/32-bit integer PCM); baseline-sequential AND
progressive JPEG decode for real via ``kgspark.ops.jpeg`` (stdlib+numpy
Huffman + IDCT, T.81 Annex G scan accumulation for SOF2).
``media_features`` dispatches by magic bytes into a deterministic
FEATURE_DIM stats vector (pixel stats for images, duration/rms/zcr/
histogram for audio). MP4 frame decode lives in ``ops.mp4``: REAL for
Motion-JPEG tracks (sample-table walk + the in-repo JPEG codec); only
inter-coded codecs (H.264/H.265/AV1/VP9) stay behind NotImplementedError
(no codec libs in this container). ``fake=True`` keeps the hash-derived
stand-in for plumbing-only tests and undecodable payloads.
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


def _untrusted(fn):
    """Crawl-scale decode policy: a malformed payload may only raise
    ValueError (or NotImplementedError for out-of-scope shapes) — stdlib
    leakage (struct.error, zlib.error, IndexError, ...) would crash the
    caller's per-payload except-ValueError routing and fail the whole Arrow
    batch. Fuzz-enforced in tests."""

    def wrapped(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (ValueError, NotImplementedError):
            raise
        except (IndexError, KeyError, OverflowError, struct.error, zlib.error) as e:
            raise ValueError(
                f"malformed {fn.__name__[7:]} stream ({type(e).__name__}: {e})"
            ) from e

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Decompression-bomb guard: web-crawl payloads are untrusted, and a few-KB
# zlib/LZW stream can claim to inflate to gigabytes. Decoders bound their
# output by the dimensions the HEADER declares, and reject headers whose
# declared size exceeds this cap — 256 MB of raw pixels, far above any
# legitimate web image, far below executor memory.
_MAX_DECODED_BYTES = 1 << 28


@_untrusted
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
    stride = w * channels
    expected = (stride + 1) * h
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG declares {w}x{h}x{channels} = {expected} decoded bytes, "
            f"over the {_MAX_DECODED_BYTES}-byte bomb guard"
        )
    # bounded inflate: never materialize more than expected+1 bytes no matter
    # what the compressed stream claims (max_length caps decompressobj output;
    # an overlong stream yields expected+1 bytes and fails the length check)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:
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


def _lzw_decode(min_code_size: int, data: bytes, max_output: int | None = None) -> bytes:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    code width growing to 12 bits). ``max_output`` bounds the accumulated
    output (bomb guard — callers pass the pixel count the header declares);
    decoding stops once that many bytes exist."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + code_size <= nbits:
        byte_idx = bitpos >> 3
        window = int.from_bytes(data[byte_idx : byte_idx + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code out of range")
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
        if max_output is not None and len(out) >= max_output:
            break
    return bytes(out)


_GIF_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@_untrusted
def decode_gif(payload: bytes) -> np.ndarray:
    """REAL stdlib GIF decode: first frame -> (h, w, 3) uint8 RGB pixels
    (LZW inflate + palette expansion; interlaced frames are deinterlaced).
    Animation (later frames), transparency compositing, and disposal
    semantics are out of scope — the first rendered frame is the corpus
    feature source. Malformed streams raise ValueError."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (bad magic)")
    pos = 6
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[pos : pos + 7])
    pos += 7
    global_palette = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        global_palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            if w * h * 3 > _MAX_DECODED_BYTES:
                raise ValueError(
                    f"GIF declares {w}x{h} pixels, over the "
                    f"{_MAX_DECODED_BYTES}-byte bomb guard"
                )
            palette = global_palette
            if iflags & 0x80:
                n = 2 ** ((iflags & 0x07) + 1)
                palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(min_code, b"".join(chunks), max_output=w * h), np.uint8
            )
            if len(idx) < w * h:
                raise ValueError("GIF pixel data short")
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                ordered = np.empty_like(idx)
                src = 0
                for start, step in _GIF_DEINTERLACE_PASSES:
                    rows = range(start, h, step)
                    ordered[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = ordered
            if idx.max(initial=0) >= len(palette):
                raise ValueError("GIF pixel index outside color table")
            return palette[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(indices: np.ndarray, palette: np.ndarray, interlaced: bool = False) -> bytes:
    """Minimal stdlib GIF89a encoder for fixtures/round-trip tests: palette
    indices (h, w) + palette (n, 3) -> a spec-valid single-frame GIF. Uses
    the classic 'uncompressed GIF' LZW trick (a CLEAR code before every
    pixel code keeps the code width fixed) — bulky but valid, and exercises
    the decoder's clear-handling path on every pixel."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_size = 1 << bits
    pal_full = np.zeros((pal_size, 3), np.uint8)
    pal_full[: len(pal)] = pal
    clear, end = pal_size, pal_size + 1
    code_size = bits + 1
    if interlaced:
        rows = [r for start, step in _GIF_DEINTERLACE_PASSES for r in range(start, h, step)]
        idx = idx[rows]
    # bit-pack [clear, p, clear, p, ..., end] LSB-first
    acc = bitlen = 0
    packed = bytearray()
    def emit(code: int) -> None:
        nonlocal acc, bitlen
        acc |= code << bitlen
        bitlen += code_size
        while bitlen >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    for p in idx.ravel():
        emit(clear)
        emit(int(p))
    emit(end)
    if bitlen:
        packed.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    out.append(bits)
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


@_untrusted
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL stdlib WAV decode: RIFF chunk walk -> PCM samples.

    Returns (samples, sample_rate) with samples float64 in [-1, 1], shape
    (n_frames, channels). Scope: integer PCM at 8/16/32 bits (the WAV
    shapes crawls actually contain); compressed/float formats raise
    NotImplementedError, malformed streams ValueError.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(payload)
    fmt = data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated WAV chunk")
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV audio format {audio_fmt} (only PCM=1 supported)")
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        arr = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        arr = np.frombuffer(data, "<i4").astype(np.float64) / float(2**31)
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported")
    frames = len(arr) - (len(arr) % channels)
    return arr[:frames].reshape(-1, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal stdlib WAV encoder (16-bit PCM): float samples in [-1, 1],
    shape (n_frames,) or (n_frames, channels) -> a spec-valid RIFF/WAVE.
    Deterministic; exists so fixtures and round-trip tests can produce real
    audio payloads without codec libraries."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a deterministic FEATURE_DIM feature vector.

    PNG / GIF / baseline-JPEG payloads decode for REAL (``decode_png`` /
    ``decode_gif`` / ``ops.jpeg.decode_jpeg``) and yield pixel statistics:
    [log1p(w), log1p(h), n_channels, per-channel means (4 slots),
    per-channel stds (4 slots), 5-bin luma histogram] — all in [0, ~22],
    deterministic across runs and partitionings. Undecodable formats raise
    NotImplementedError (MP4 frame decode is ``ops.mp4.decode_mp4_frames``
    — real for MJPEG tracks; inter-coded codecs need libraries this
    container lacks); ``fake=True`` derives an md5-seeded stand-in vector
    instead, keeping the distributed plumbing exercisable for any payload.
    """
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        return (raw.astype(np.float64) / float(2**32)).astype(np.float32)
    return _pixel_stats(decode_image_pixels(payload))


def decode_image_pixels(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch into the REAL decoders: PNG / GIF / JPEG
    (baseline + progressive) payload -> (h, w, channels) uint8 pixels.
    Other formats raise NotImplementedError; malformed streams ValueError."""
    head = bytes(payload or b"")
    if head.startswith(_PNG_MAGIC):
        return decode_png(head)
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(head)
    if head[:3] == b"\xff\xd8\xff":
        from kgspark.ops.jpeg import decode_jpeg

        return decode_jpeg(head)
    raise NotImplementedError(
        "only PNG/GIF/JPEG (baseline + progressive) decode without codec "
        "libraries (this container has none); pass fake=True for the "
        "deterministic stand-in on other formats (MP4 container metadata "
        "parses for real via ops.mp4.parse_mp4_meta; frame decode stays "
        "codec-stubbed)"
    )


def _pixel_stats(pixels: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 pixels -> the FEATURE_DIM stats vector (see
    ``decode_image``)."""
    px = pixels.astype(np.float64) / 255.0
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


def media_features(payload: bytes, fake: bool = False) -> np.ndarray:
    """Format-dispatching feature extraction: PNG -> pixel statistics
    (``decode_image``), RIFF/WAVE -> audio statistics ([log1p(duration_ms),
    log1p(rate), channels, rms, peak, zero-crossing rate, 5-bin |amplitude|
    histogram] in the same FEATURE_DIM layout). Other formats raise
    NotImplementedError unless ``fake=True`` (hash-derived stand-in) —
    MP4 frame decode needs codec libraries this container lacks."""
    if fake:
        return decode_image(payload, fake=True)
    head = bytes(payload or b"")
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        samples, rate = decode_wav(head)
        n_frames, channels = samples.shape
        mono = samples.mean(axis=1) if channels > 1 else samples[:, 0]
        feat = np.zeros(FEATURE_DIM, dtype=np.float64)
        feat[0] = np.log1p(1000.0 * n_frames / rate)  # duration_ms
        feat[1] = np.log1p(rate)
        feat[2] = float(channels)
        if n_frames:
            feat[3] = float(np.sqrt(np.mean(mono**2)))  # rms
            feat[4] = float(np.abs(mono).max())  # peak
            if n_frames > 1:
                feat[5] = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            hist, _ = np.histogram(np.abs(mono), bins=5, range=(0.0, 1.0))
            feat[11:16] = hist / float(n_frames)
        return feat.astype(np.float32)
    return decode_image(head, fake=False)


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
                None if payload is None else media_features(bytes(payload), fake=fake).tolist()
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


def make_decodable_media(spark, n: int) -> DataFrame:
    """Deterministic media table whose payloads REALLY decode: row ``i``
    is generated executor-side (mapInPandas over ``spark.range`` — no
    driver-side byte shipping, scales with partitions) from an id-seeded
    RNG, cycling through the real codecs: baseline JPEG 4:4:4, JPEG 4:2:0
    with restart markers, PNG (Paeth filter), GIF, and PCM WAV. Same id ->
    same bytes on every executor, run, and partitioning."""
    from kgspark.ops.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(1000 + i)
                h, w = 8 + i % 5, 8 + i % 7
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                ones = np.ones(64, dtype=np.int64)
                fmt = i % 5
                if fmt == 0:
                    payloads.append(encode_jpeg(px, luma_q=ones, chroma_q=ones))
                    kinds.append("image")
                elif fmt == 1:
                    payloads.append(
                        encode_jpeg(
                            px, luma_q=ones, chroma_q=ones, subsample=True,
                            restart_interval=2,
                        )
                    )
                    kinds.append("image")
                elif fmt == 2:
                    payloads.append(encode_png(px, filter_type=4))
                    kinds.append("image")
                elif fmt == 3:
                    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
                    idx = rng.integers(0, 8, size=(h, w), dtype=np.uint8)
                    payloads.append(encode_gif(idx, pal))
                    kinds.append("image")
                else:
                    t = np.arange(800) / 8000.0
                    wave = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                    payloads.append(encode_wav(wave[:, None], 8000))
                    kinds.append("audio")
            yield pd.DataFrame(
                {"media_id": pdf["id"], "kind": kinds, "payload": payloads}
            )

    return spark.range(n).mapInPandas(
        gen, schema="media_id long, kind string, payload binary"
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
