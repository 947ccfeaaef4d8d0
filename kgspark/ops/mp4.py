"""MP4/ISO-BMFF container metadata — REAL box parsing, codec-only stub.

The codec payloads (H.264/AAC frames in ``mdat``) need libraries this
container lacks, but the ISO base-media box structure is pure struct
walking: ``parse_mp4_meta`` reads the brand (``ftyp``), movie duration
(``moov/mvhd``), and per-track kind/codec/geometry
(``trak/tkhd`` + ``mdia/hdlr`` + ``stbl/stsd``) from the raw bytes.
That upgrades video handling from "opaque binary" to real metadata —
enough to drive ``multimodal.frame_sample_plan`` with true durations and
to route payloads by codec at the catalog level; only frame *pixel*
decode stays behind NotImplementedError.

Untrusted-bytes policy (same as the image/audio decoders): any malformed
stream raises ValueError, never a stdlib exception; box recursion is
depth- and count-bounded so a crafted box tree can't wedge an executor.

``encode_mp4_stub`` is the fixture counterpart: a spec-shaped minimal box
tree (ftyp + moov(mvhd, trak...) + empty mdat) the tests and the media
fixtures round-trip against.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MAX_BOXES = 4096  # bomb guard: a real moov tree is tens of boxes
_MAX_DEPTH = 16


def _boxes(data: bytes, start: int, end: int, depth: int, count: list[int]):
    """Yield (type, payload_start, payload_end) for the boxes in a range."""
    if depth > _MAX_DEPTH:
        raise ValueError("MP4 box tree deeper than the sanity bound")
    pos = start
    while pos + 8 <= end:
        count[0] += 1
        if count[0] > _MAX_BOXES:
            raise ValueError("MP4 declares more boxes than the sanity bound")
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns its container")
        yield typ, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int):
    """(version, flags, payload offset past the version/flags word)."""
    ver = data[start]
    return ver, start + 4


def parse_mp4_meta(payload: bytes) -> dict:
    """MP4 bytes -> {brand, duration_ms, tracks:[{kind, codec, width,
    height, duration_ms}]}. Raises ValueError on malformed streams and
    on non-MP4 input (sniff with the ``ftyp`` magic first)."""
    try:
        return _parse_impl(bytes(payload))
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"malformed MP4 stream ({type(e).__name__}: {e})") from e


def _parse_impl(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF stream (no ftyp box)")
    count = [0]
    out = {"brand": data[8:12].decode("latin1"), "duration_ms": None, "tracks": []}
    for typ, b0, b1 in _boxes(data, 0, len(data), 0, count):
        if typ != b"moov":
            continue
        for t2, c0, c1 in _boxes(data, b0, b1, 1, count):
            if t2 == b"mvhd":
                ver, p = _fullbox(data, c0)
                if ver == 1:
                    timescale = struct.unpack(">I", data[p + 16 : p + 20])[0]
                    duration = struct.unpack(">Q", data[p + 20 : p + 28])[0]
                else:
                    timescale, duration = struct.unpack(">II", data[p + 8 : p + 16])
                if timescale:
                    out["duration_ms"] = int(duration * 1000 // timescale)
            elif t2 == b"trak":
                out["tracks"].append(_parse_trak(data, c0, c1, count))
    if out["duration_ms"] is None and not out["tracks"]:
        raise ValueError("MP4 contains no moov metadata")
    return out


def _parse_trak(data: bytes, start: int, end: int, count: list[int]) -> dict:
    track = {"kind": None, "codec": None, "width": None, "height": None,
             "duration_ms": None}
    mdia = None
    for typ, b0, b1 in _boxes(data, start, end, 2, count):
        if typ == b"tkhd":
            ver, p = _fullbox(data, b0)
            geo = p + (32 if ver == 1 else 20) + 52  # past ids/durations/matrix
            if geo + 8 <= b1:
                w, h = struct.unpack(">II", data[geo : geo + 8])
                track["width"], track["height"] = w >> 16, h >> 16  # 16.16 fixed
        elif typ == b"mdia":
            mdia = (b0, b1)
    if mdia is None:
        return track
    for typ, b0, b1 in _boxes(data, mdia[0], mdia[1], 3, count):
        if typ == b"mdhd":
            ver, p = _fullbox(data, b0)
            if ver == 1:
                timescale = struct.unpack(">I", data[p + 16 : p + 20])[0]
                duration = struct.unpack(">Q", data[p + 20 : p + 28])[0]
            else:
                timescale, duration = struct.unpack(">II", data[p + 8 : p + 16])
            if timescale:
                track["duration_ms"] = int(duration * 1000 // timescale)
        elif typ == b"hdlr":
            handler = data[b0 + 8 : b0 + 12]
            track["kind"] = {b"vide": "video", b"soun": "audio", b"text": "text"}.get(
                handler, handler.decode("latin1")
            )
        elif typ == b"minf":
            for t2, c0, c1 in _boxes(data, b0, b1, 4, count):
                if t2 != b"stbl":
                    continue
                for t3, d0, d1 in _boxes(data, c0, c1, 5, count):
                    if t3 == b"stsd" and d0 + 16 <= d1:
                        # fullbox(4) + entry_count(4) + first entry size(4)+fourcc(4)
                        track["codec"] = data[d0 + 12 : d0 + 16].decode("latin1")
    return track


def decode_mp4_frames(payload: bytes):
    """Frame pixel decode needs H.264/H.265/AV1 codec libraries this
    container lacks — route to ffmpeg/PyAV on a real deployment. The
    container metadata above is real; only this step is stubbed."""
    raise NotImplementedError(
        "MP4 frame decode requires codec libraries (ffmpeg/PyAV); "
        "parse_mp4_meta provides the real container metadata"
    )


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------
def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def encode_mp4_stub(
    duration_ms: int = 2000,
    width: int = 640,
    height: int = 360,
    codec: str = "avc1",
    audio: bool = True,
) -> bytes:
    """Minimal spec-shaped MP4: ftyp + moov(mvhd + video trak [+ audio
    trak]) + empty mdat. Timescale 1000 so duration_ms maps 1:1. The mdat
    carries no real samples — this is a metadata fixture, matching the
    honest codec stub."""
    timescale, dur = 1000, duration_ms

    def full(typ: bytes, body: bytes, version: int = 0) -> bytes:
        return _box(typ, bytes([version, 0, 0, 0]) + body)

    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\x01\x00\x00\x00"  # volume 1.0 + reserved
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),  # next track id
    )

    def trak(track_id: int, kind: bytes, fourcc: bytes, w: int, h: int) -> bytes:
        tkhd = full(
            b"tkhd",
            struct.pack(">IIIII", 0, 0, track_id, 0, dur)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0 if kind == b"vide" else 0x0100, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = full(
            b"mdhd", struct.pack(">IIII", 0, 0, timescale, dur) + struct.pack(">HH", 0x55C4, 0)
        )
        hdlr = full(b"hdlr", struct.pack(">I", 0) + kind + b"\x00" * 12 + b"kgspark\x00")
        sample_entry = _box(fourcc, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
        stsd = full(b"stsd", struct.pack(">I", 1) + sample_entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak(1, b"vide", codec.encode("latin1"), width, height)
    if audio:
        traks += trak(2, b"soun", b"mp4a", 0, 0)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat


def frame_sample_plan_mp4(
    media: DataFrame, every_ms: int = 1000, payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan driven by REAL container durations: parse
    each payload's moov metadata, keep video tracks, and emit one row per
    (media_id, frame_ts_ms) — the sampling schedule a codec-equipped
    deployment feeds to the (stubbed) frame decoder. JVM-side explode over
    the parsed durations; same contract as ``multimodal.frame_sample_plan``
    but without trusting caller-supplied metadata."""
    from pyspark.sql import functions as F

    meta = mp4_meta(media, payload_col=payload_col, id_col=id_col)
    return meta.filter(
        F.col("video_codec").isNotNull() & (F.col("duration_ms") > 0)
    ).select(
        id_col,
        "video_codec",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def mp4_meta(media: DataFrame, payload_col: str = "payload",
             id_col: str = "media_id") -> DataFrame:
    """(id, payload) -> parsed container metadata columns, one Arrow-batched
    Python stage (partition-preserving). Non-MP4/malformed payloads yield
    NULL metadata rather than failing the batch."""
    cols = media.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                rec = {"_id": i, "brand": None, "duration_ms": None,
                       "n_tracks": None, "video_codec": None,
                       "width": None, "height": None}
                if payload is not None:
                    try:
                        meta = parse_mp4_meta(bytes(payload))
                        rec["brand"] = meta["brand"]
                        rec["duration_ms"] = meta["duration_ms"]
                        rec["n_tracks"] = len(meta["tracks"])
                        for t in meta["tracks"]:
                            if t["kind"] == "video":
                                rec["video_codec"] = t["codec"]
                                rec["width"] = t["width"]
                                rec["height"] = t["height"]
                                break
                    except ValueError:
                        pass
                rows.append(rec)
            out = pd.DataFrame(rows).rename(columns={"_id": id_col})
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            out["n_tracks"] = out["n_tracks"].astype("Int64")
            out["width"] = out["width"].astype("Int64")
            out["height"] = out["height"].astype("Int64")
            yield out

    return cols.mapInPandas(
        run,
        schema=(
            f"{id_col} long, brand string, duration_ms long, n_tracks long, "
            "video_codec string, width long, height long"
        ),
    )
