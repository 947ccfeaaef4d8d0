"""MP4/ISO-BMFF container metadata + REAL Motion-JPEG frame decode.

The ISO base-media box structure is pure struct walking:
``parse_mp4_meta`` reads the brand (``ftyp``), movie duration
(``moov/mvhd``), and per-track kind/codec/geometry
(``trak/tkhd`` + ``mdia/hdlr`` + ``stbl/stsd``) from the raw bytes.
``extract_video_samples`` goes further and walks the full sample tables
(``stts``/``stsz``/``stsc``/``stco``/``co64``) to slice every video
sample with its presentation timestamp out of ``mdat`` — at which point
an MJPEG track (fourcc ``jpeg``/``mjpa``/``mjpb``: each sample is a
complete JPEG image) decodes to REAL pixels via the repo's own
``ops.jpeg`` codec (``decode_mp4_frames``). Inter-coded codecs
(H.264/H.265/AV1/VP9) genuinely need external libraries this container
lacks and stay behind NotImplementedError with the sample bytes already
extracted — on a codec-equipped deployment only the last per-sample call
swaps out.

Untrusted-bytes policy (same as the image/audio decoders): any malformed
stream raises ValueError, never a stdlib exception; box recursion is
depth- and count-bounded and sample counts capped so a crafted box tree
can't wedge an executor.

``encode_mp4_stub`` (metadata-only tree) and ``encode_mjpeg_mp4`` (real
sample tables + real JPEG samples in ``mdat``) are the fixture
counterparts the tests and media fixtures round-trip against.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAX_BOXES = 4096  # bomb guard: a real moov tree is tens of boxes
_MAX_DEPTH = 16
_MAX_SAMPLES = 65536  # bomb guard: a crafted stsz can't allocate unbounded
_MJPEG_FOURCC = ("jpeg", "mjpa", "mjpb")


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


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    if pos + 4 * n > len(data):
        raise ValueError("MP4 sample table overruns its box")
    return list(struct.unpack(f">{n}I", data[pos : pos + 4 * n]))


def _video_sample_tables(data: bytes) -> dict:
    """First video track's sample tables: {codec, timescale, stts:[(count,
    delta)], sizes:[int], stsc:[(first_chunk, samples_per_chunk)],
    chunk_offsets:[int]}. Raises ValueError when no video track carries a
    complete table set."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4/ISO-BMFF stream (no ftyp box)")
    count = [0]
    for typ, b0, b1 in _boxes(data, 0, len(data), 0, count):
        if typ != b"moov":
            continue
        for t2, c0, c1 in _boxes(data, b0, b1, 1, count):
            if t2 != b"trak":
                continue
            tab = _trak_sample_tables(data, c0, c1, count)
            if tab is not None:
                return tab
    raise ValueError("MP4 contains no video track with complete sample tables")


def _trak_sample_tables(data: bytes, start: int, end: int, count: list[int]):
    timescale, is_video, tab = None, False, {}
    for typ, b0, b1 in _boxes(data, start, end, 2, count):
        if typ != b"mdia":
            continue
        for t2, c0, c1 in _boxes(data, b0, b1, 3, count):
            if t2 == b"mdhd":
                ver, p = _fullbox(data, c0)
                off = p + (16 if ver == 1 else 8)
                timescale = struct.unpack(">I", data[off : off + 4])[0]
            elif t2 == b"hdlr":
                is_video = data[c0 + 8 : c0 + 12] == b"vide"
            elif t2 == b"minf":
                for t3, d0, d1 in _boxes(data, c0, c1, 4, count):
                    if t3 == b"stbl":
                        tab = _parse_stbl(data, d0, d1, count)
    if not is_video or not {"codec", "stts", "sizes", "stsc", "chunk_offsets"} <= set(tab):
        return None
    tab["timescale"] = timescale or 1000
    return tab


def _parse_stbl(data: bytes, start: int, end: int, count: list[int]) -> dict:
    tab: dict = {}
    for typ, b0, b1 in _boxes(data, start, end, 5, count):
        _ver, p = _fullbox(data, b0)
        if typ == b"stsd" and p + 12 <= b1:
            tab["codec"] = data[p + 8 : p + 12].decode("latin1")
        elif typ == b"stts":
            (n,) = _u32s(data, p, 1)
            flat = _u32s(data, p + 4, min(2 * n, (b1 - p - 4) // 4))
            tab["stts"] = list(zip(flat[0::2], flat[1::2]))
        elif typ == b"stsz":
            uniform, n = _u32s(data, p, 2)
            if n > _MAX_SAMPLES:
                raise ValueError("MP4 declares more samples than the sanity bound")
            if not uniform and p + 8 + 4 * n > b1:
                # bound by the box like co64, not by total file length —
                # otherwise a lying entry count silently reads the NEXT
                # boxes' bytes as sample sizes (garbage offsets downstream)
                raise ValueError("MP4 stsz overruns its box")
            tab["sizes"] = [uniform] * n if uniform else _u32s(data, p + 8, n)
        elif typ == b"stsc":
            (n,) = _u32s(data, p, 1)
            flat = _u32s(data, p + 4, min(3 * n, (b1 - p - 4) // 4))
            tab["stsc"] = [(flat[i], flat[i + 1]) for i in range(0, len(flat) - 2, 3)]
        elif typ == b"stco":
            (n,) = _u32s(data, p, 1)
            if p + 4 + 4 * n > b1:
                raise ValueError("MP4 stco overruns its box")
            tab["chunk_offsets"] = _u32s(data, p + 4, n)
        elif typ == b"co64":
            (n,) = _u32s(data, p, 1)
            if p + 4 + 8 * n > b1:
                raise ValueError("MP4 co64 overruns its box")
            tab["chunk_offsets"] = list(
                struct.unpack(f">{n}Q", data[p + 4 : p + 4 + 8 * n])
            )
    return tab


def extract_video_samples(payload: bytes) -> tuple[str, list[tuple[int, bytes]]]:
    """MP4 bytes -> (video codec fourcc, [(ts_ms, sample bytes), ...]) for
    the first video track, by walking the real sample tables: ``stsc``
    maps samples to chunks, ``stco``/``co64`` gives chunk file offsets,
    ``stsz`` sizes lay samples contiguously within each chunk, ``stts``
    supplies decode timestamps on the ``mdhd`` timescale. Raises
    ValueError on malformed/truncated tables (untrusted-bytes policy)."""
    try:
        return _extract_samples_impl(bytes(payload))
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"malformed MP4 stream ({type(e).__name__}: {e})") from e


def _extract_samples_impl(data: bytes) -> tuple[str, list[tuple[int, bytes]]]:
    tab = _video_sample_tables(data)
    sizes, stsc, chunks = tab["sizes"], tab["stsc"], tab["chunk_offsets"]
    n = len(sizes)
    if not stsc or not chunks:
        raise ValueError("MP4 video track has empty chunk tables")
    # sample -> absolute offset: walk chunks, advancing the stsc run
    offsets: list[int] = []
    entry = 0
    for ci, chunk_off in enumerate(chunks):
        while entry + 1 < len(stsc) and stsc[entry + 1][0] <= ci + 1:
            entry += 1
        off = chunk_off
        for _ in range(stsc[entry][1]):
            if len(offsets) >= n:
                break
            offsets.append(off)
            off += sizes[len(offsets) - 1]
    if len(offsets) < n:
        raise ValueError("MP4 chunk tables cover fewer samples than stsz declares")
    # decode timestamps from the stts run-lengths
    ts: list[int] = []
    t = 0
    for cnt, delta in tab["stts"]:
        for _ in range(cnt):
            if len(ts) >= n:
                break
            ts.append(t)
            t += delta
    if len(ts) < n:
        raise ValueError("MP4 stts covers fewer samples than stsz declares")
    timescale = tab["timescale"]
    out = []
    for i in range(n):
        o, s = offsets[i], sizes[i]
        if o + s > len(data):
            raise ValueError("MP4 sample overruns the file")
        out.append((int(ts[i] * 1000 // timescale), data[o : o + s]))
    return tab["codec"], out


def decode_mp4_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """MP4 bytes -> [(ts_ms, (h, w, c) uint8 pixels)] — REAL decode for
    Motion-JPEG tracks (fourcc ``jpeg``/``mjpa``/``mjpb``; every sample is
    a complete JPEG image, decoded by ``ops.jpeg.decode_jpeg``). Inter-
    coded codecs (H.264/H.265/AV1/VP9) raise NotImplementedError: they
    need codec libraries this container lacks — the sample extraction
    above is already real, so a codec-equipped deployment swaps only the
    per-sample decode call (ffmpeg/PyAV). The codec gate reads the
    container metadata, so a metadata-only tree (no sample tables) with an
    inter-coded fourcc still reports NotImplementedError, not a
    table-parsing ValueError."""
    data = bytes(payload)
    meta = parse_mp4_meta(data)
    codec = next(
        (t["codec"] for t in meta["tracks"] if t["kind"] == "video"), None
    )
    if codec is None:
        raise ValueError("MP4 contains no video track")
    if codec not in _MJPEG_FOURCC:
        raise NotImplementedError(
            f"MP4 video codec {codec!r} needs external decode libraries "
            "(ffmpeg/PyAV); MJPEG tracks ('jpeg'/'mjpa'/'mjpb') decode natively"
        )
    track_codec, samples = extract_video_samples(data)
    if track_codec not in _MJPEG_FOURCC:
        # the metadata gate above checks the FIRST video track; the track
        # the extractor actually selected is the first one with complete
        # sample tables — in a multi-track file these can differ, and
        # feeding inter-coded samples to the JPEG decoder would surface as
        # a misleading malformed-JPEG ValueError
        raise NotImplementedError(
            f"MP4 sample-bearing video track codec {track_codec!r} needs "
            "external decode libraries (ffmpeg/PyAV)"
        )
    from kgspark.ops.jpeg import decode_jpeg

    return [(ts, decode_jpeg(s)) for ts, s in samples]


def mp4_frames(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, payload) -> one row per decoded video frame — ts_ms, geometry,
    and the mean pixel value (rounded to 5 decimals) — via the real
    sample-table walk + per-sample JPEG decode, one Arrow-batched Python
    stage (partition-preserving, no shuffle). Payloads that can't decode
    (inter-coded codecs, malformed bytes) yield zero rows rather than
    failing the batch; route those by codec via ``mp4_meta`` first."""
    cols = media.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            ts_l: list[int] = []
            hh: list[int] = []
            ww: list[int] = []
            mm: list[float] = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    frames = decode_mp4_frames(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                for ts, px in frames:
                    ids.append(int(i))
                    ts_l.append(int(ts))
                    hh.append(int(px.shape[0]))
                    ww.append(int(px.shape[1]))
                    mm.append(float(np.round(px.astype(np.float64).mean(), 5)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "ts_ms": pd.Series(ts_l, dtype="int64"),
                    "height": pd.Series(hh, dtype="int32"),
                    "width": pd.Series(ww, dtype="int32"),
                    "mean_px": pd.Series(mm, dtype="float64"),
                }
            )

    return cols.mapInPandas(
        run,
        schema=f"{id_col} long, ts_ms long, height int, width int, mean_px double",
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


def encode_mjpeg_mp4(
    frames: list[np.ndarray],
    fps: int = 4,
    codec: str = "jpeg",
    **jpeg_kwargs,
) -> bytes:
    """Spec-shaped Motion-JPEG MP4 fixture: every frame is encoded with
    the repo's own ``ops.jpeg.encode_jpeg`` and laid contiguously into
    ``mdat`` behind REAL sample tables — ``stts`` (one run of 1000//fps
    ticks on the 1000 timescale), ``stsz`` per-sample sizes, and a
    two-chunk ``stsc``/``stco`` split (when >=2 samples) so the
    ``extract_video_samples`` chunk-run walk is genuinely exercised.
    ``stco`` holds absolute file offsets, so ``moov`` is built twice: once
    with zero offsets to learn its (offset-independent) byte length, then
    with the real positions. ``codec`` defaults to the MJPEG fourcc;
    passing e.g. ``"avc1"`` builds a negative fixture whose samples exist
    but whose codec gate must refuse to decode."""
    from kgspark.ops.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_mjpeg_mp4 needs at least one frame")
    if not 1 <= int(fps) <= 1000:
        raise ValueError("fps must be in [1, 1000]")
    samples = [
        encode_jpeg(np.asarray(f, dtype=np.uint8), **jpeg_kwargs) for f in frames
    ]
    n = len(samples)
    h, w = np.asarray(frames[0]).shape[:2]
    timescale, delta = 1000, 1000 // int(fps)
    dur = n * delta
    k = (n + 1) // 2  # chunk 1 gets k samples, chunk 2 the remainder
    two_chunks = n - k > 0

    def full(typ: bytes, body: bytes, version: int = 0) -> bytes:
        return _box(typ, bytes([version, 0, 0, 0]) + body)

    def moov(chunk_offsets: list[int]) -> bytes:
        mvhd = full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">I", 0x00010000)  # rate 1.0
            + b"\x01\x00\x00\x00"  # volume 1.0 + reserved
            + b"\x00" * 8
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),  # next track id
        )
        tkhd = full(
            b"tkhd",
            struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = full(
            b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"kgspark\x00"
        )
        sample_entry = _box(
            codec.encode("latin1"), b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70
        )
        stsd = full(b"stsd", struct.pack(">I", 1) + sample_entry)
        stts = full(b"stts", struct.pack(">III", 1, n, delta))
        stsz = full(
            b"stsz", struct.pack(f">II{n}I", 0, n, *[len(s) for s in samples])
        )
        stsc_entries = [(1, k, 1)] + ([(2, n - k, 1)] if two_chunks else [])
        stsc = full(
            b"stsc",
            struct.pack(">I", len(stsc_entries))
            + b"".join(struct.pack(">III", *e) for e in stsc_entries),
        )
        stco = full(
            b"stco",
            struct.pack(
                f">I{len(chunk_offsets)}I", len(chunk_offsets), *chunk_offsets
            ),
        )
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    n_chunks = 2 if two_chunks else 1
    sizing = moov([0] * n_chunks)  # stco entries are fixed-width u32s
    data_start = len(ftyp) + len(sizing) + 8  # + mdat box header
    offsets = [data_start]
    if two_chunks:
        offsets.append(data_start + sum(len(s) for s in samples[:k]))
    return ftyp + moov(offsets) + _box(b"mdat", b"".join(samples))


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
