"""Baseline-sequential JPEG codec, stdlib + numpy only.

The reference has no media handling at all; this is north-rule surface for
a web-scale corpus, where baseline JPEG is the dominant image shape. The
decoder implements the ITU T.81 baseline process: marker parse -> Huffman
entropy decode (DC diff + AC run/size, byte unstuffing, restart markers) ->
dequantize -> inverse zigzag -> 2-D IDCT (orthonormal DCT-II matrix pair) ->
level shift -> chroma upsample (any integer sampling factors, 4:4:4 and
4:2:0 covered by tests) -> YCbCr->RGB. Progressive (SOF2) also decodes:
spectral-selection + successive-approximation scans (DC first/refine,
AC first/refine with EOB runs, T.81 Annex G) accumulate into per-component
coefficient planes reconstructed at EOI. Arithmetic coding and hierarchical
modes raise NotImplementedError — route those to a codec library on a real
deployment; everything here is deterministic (same bytes -> same pixels on
every executor).

``encode_jpeg`` is the fixture/egress counterpart: a spec-valid baseline
encoder (4:4:4 or 4:2:0, per-image canonical Huffman tables emitted in
DHT, quality-scaled or caller-supplied quantization tables). With an
all-ones quantization table the round-trip error is DCT float rounding
only (<= 2/255 per sample), which is what the tests pin.

Decompression-bomb guard: dimensions come from the SOF header and are
capped before any pixel buffer is allocated (same policy as the PNG/GIF
decoders in ops/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DECODED_BYTES = 1 << 28  # matches ops/multimodal's bomb-guard cap

# zigzag order: index i of the scan -> position in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: block = C.T @ coeffs @ C inverts the forward DCT
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# standard luminance/chrominance quantization tables (T.81 Annex K.1),
# in zigzag order — scaled by the encoder's quality knob
_STD_LUMA_Q = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    dtype=np.int64,
)
_STD_CHROMA_Q = np.array(
    [
        17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT segment's (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], huffval: bytes):
        # (length, code) -> symbol; codes assigned canonically
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed 0xFF data byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: the caller should have
                # consumed it via sync_restart; treat as stream error
                raise ValueError("unexpected RST marker inside entropy data")
            else:
                # EOI or other marker: baseline decoders pad with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (or (h, w, 1) for grayscale).

    Scope: baseline sequential Huffman (SOF0; SOF1 extended-sequential also
    accepted — same process, 8-bit), progressive Huffman (SOF2, all four
    scan types), any integer sampling factors, restart intervals.
    Arithmetic/hierarchical modes raise NotImplementedError; malformed
    streams raise ValueError — including truncation/corruption anywhere in
    the marker or entropy stream (web crawls feed this untrusted bytes, so
    no stdlib exception may escape as anything but ValueError).
    """
    try:
        return _decode_jpeg_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, StopIteration, OverflowError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream ({type(e).__name__}: {e})") from e


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past any residual entropy/pad/fill bytes to the next real
    marker (0xFF followed by a non-0x00, non-fill byte)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            if nxt != 0x00:
                return pos
            pos += 2  # stuffed data byte
        else:
            pos += 1
    raise ValueError("JPEG truncated while seeking next marker")


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    data = bytes(payload)
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG stream (bad magic)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq), ...])
    progressive = False
    coeffs = None  # progressive: per-comp (blocks_y, blocks_x, 64) zigzag int32
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if progressive and coeffs is not None:
                return _reconstruct(frame, coeffs, qtables)
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:  # 16-bit table
                    qtables[tq] = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} (8-bit only)")
            if w * h * 3 > _MAX_DECODED_BYTES:
                raise ValueError(
                    f"JPEG declares {w}x{h} pixels, over the "
                    f"{_MAX_DECODED_BYTES}-byte bomb guard"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                h_max = max(c[1] for c in comps)
                v_max = max(c[2] for c in comps)
                mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
                mcus_y = (h + 8 * v_max - 1) // (8 * v_max)
                coeffs = [
                    np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (baseline/progressive huffman only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = seg[i + 17 : i + 17 + nsym]
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffTable(bits, huffval)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (comp index in frame, dc table, ac table)
            h, w, comps = frame
            for s in range(ns):
                cs, tables = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tables >> 4, tables & 0x0F))
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qtables, dc_tables, ac_tables,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            end = _decode_progressive_scan(
                data, pos + seglen, frame, scan, coeffs, dc_tables, ac_tables,
                ss, se, ah_al >> 4, ah_al & 0x0F, restart_interval,
            )
            pos = _next_marker(data, end) - 2  # loop adds seglen below
            seglen = 2
        pos += seglen
    raise ValueError("JPEG contains no scan data")


def _decode_progressive_scan(
    data, start, frame, scan, coeffs, dc_tables, ac_tables,
    ss, se, ah, al, restart_interval,
):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component) or AC first/refine (single-component only, per spec).
    Mutates ``coeffs`` in place; returns the stream position where the
    entropy data ended."""
    h, w, comps = frame
    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (h + 8 * v_max - 1) // (8 * v_max)
    reader = _BitReader(data, start)
    eobrun = [0]
    preds = [0] * len(comps)

    def check_tables(dc_id, ac_id):
        if ss == 0 and ah == 0 and dc_tables.get(dc_id) is None:
            raise ValueError("JPEG scan references missing DC Huffman table")
        if ss > 0 and ac_tables.get(ac_id) is None:
            raise ValueError("JPEG scan references missing AC Huffman table")

    def restart():
        reader.sync_restart()
        eobrun[0] = 0
        for i in range(len(preds)):
            preds[i] = 0

    if ss == 0:  # DC scan (Se must be 0); interleaved or single-component
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if len(scan) > 1:  # interleaved MCU order
            unit_count = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        restart()
                    unit_count += 1
                    for ci, dc_id, ac_id in scan:
                        check_tables(dc_id, ac_id)
                        _, hi, vi, _tq = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                blk = coeffs[ci][my * vi + by, mx * hi + bx]
                                _dc_unit(reader, dc_tables.get(dc_id), blk, ah, al, preds, ci)
        else:
            ci, dc_id, ac_id = scan[0]
            check_tables(dc_id, ac_id)
            bh, bw = _comp_block_dims(frame, ci)
            unit_count = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and unit_count and unit_count % restart_interval == 0:
                        restart()
                    unit_count += 1
                    _dc_unit(reader, dc_tables.get(dc_id), coeffs[ci][by, bx], ah, al, preds, ci)
    else:  # AC scan: single component, non-interleaved block order
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, dc_id, ac_id = scan[0]
        check_tables(dc_id, ac_id)
        act = ac_tables.get(ac_id)
        bh, bw = _comp_block_dims(frame, ci)
        unit_count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit_count and unit_count % restart_interval == 0:
                    restart()
                unit_count += 1
                blk = coeffs[ci][by, bx]
                if ah == 0:
                    _ac_first_unit(reader, act, blk, ss, se, al, eobrun)
                else:
                    _ac_refine_unit(reader, act, blk, ss, se, al, eobrun)
    return reader.pos


def _comp_block_dims(frame, ci):
    """Block rows/cols of a component in NON-interleaved scan order:
    ceil(scaled dimension / 8), not padded to the MCU grid (T.81 A.2.2)."""
    h, w, comps = frame
    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    _, hi, vi, _tq = comps[ci]
    cw = (w * hi + h_max - 1) // h_max
    ch = (h * vi + v_max - 1) // v_max
    return (ch + 7) // 8, (cw + 7) // 8


def _dc_unit(reader, dct, blk, ah, al, preds, ci):
    if ah == 0:  # first pass: huffman-coded diff at precision Al
        t = reader.decode_symbol(dct)
        preds[ci] += _extend(reader.receive(t), t)
        blk[0] = preds[ci] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            blk[0] |= 1 << al


def _ac_first_unit(reader, act, blk, ss, se, al, eobrun):
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1
            if r:
                eobrun[0] += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC index out of spectral band")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_unit(reader, act, blk, ss, se, al, eobrun):
    """T.81 G.2.2 / libjpeg decode_mcu_AC_refine: advance through the band
    appending correction bits to already-nonzero history coefficients and
    placing +-1<<Al newly-significant ones."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:  # EOB run — current block is a member: the
                    # shared tail below reads its corrections and decrements
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.receive(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement scan")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        while k <= se:  # EOB span still refines existing coefficients
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def _reconstruct(frame, coeffs, qtables):
    """Zigzag coefficient planes -> pixels: vectorized dequant + batch IDCT
    + upsample + color transform (shared finish for the progressive path)."""
    h, w, comps = frame
    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    full = []
    for (cid, hi, vi, tq), arr in zip(comps, coeffs):
        qt = qtables.get(tq)
        if qt is None:
            raise ValueError("JPEG frame references missing quantization table")
        by, bx = arr.shape[:2]
        deq = arr.astype(np.float64) * qt[None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq
        blocks = nat.reshape(by, bx, 8, 8)
        # batch IDCT: C.T @ B @ C per block
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        up = np.repeat(np.repeat(plane, v_max // vi, axis=0), h_max // hi, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255)[:, :, None].astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (1 or 3 supported)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_scan(data, start, frame, scan, qtables, dc_tables, ac_tables, restart_interval):
    h, w, comps = frame
    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component coefficient planes at that component's resolution
    planes = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(data, start)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, dc_id, ac_id in scan:
                _, hi, vi, tq = comps[ci]
                dct = dc_tables.get(dc_id)
                act = ac_tables.get(ac_id)
                if dct is None or act is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dct)
                        diff = _extend(reader.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: skip 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index out of range")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_ZIGZAG] = zz * qtables[tq]
                        block = _C.T @ coeffs.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample every component to full MCU-grid resolution, then crop
    full = []
    for (cid, hi, vi, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, v_max // vi, axis=0), h_max // hi, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return y[:, :, None].astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (1 or 3 supported)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _eob_tokens(tokens: list, eobrun: int, be_bits: list) -> tuple[int, list]:
    """Append the pending EOB-run symbol (nbits<<4 + appended bits, T.81
    G.1.2.2) followed by the correction bits buffered against it."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        tokens.append(("sym", nbits << 4))
        if nbits:
            tokens.append(("raw", eobrun - (1 << nbits), nbits))
        for b in be_bits:
            tokens.append(("raw", b, 1))
        return 0, []
    return eobrun, be_bits


def _ac_first_tokens(blocks: list[np.ndarray], al: int) -> list:
    """Token stream (('sym', s) | ('raw', v, n)) for a progressive AC
    first scan over Ss=1..63 at point transform ``al``, with EOB runs."""
    tokens: list = []
    eobrun = 0
    for q in blocks:
        t = [0] * 64
        for k in range(1, 64):
            v = int(q[k])
            m = abs(v) >> al
            t[k] = m if v >= 0 else -m
        last = max((k for k in range(1, 64) if t[k]), default=0)
        if last == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _eob_tokens(tokens, eobrun, [])
            continue
        eobrun, _ = _eob_tokens(tokens, eobrun, [])
        r = 0
        for k in range(1, last + 1):
            v = t[k]
            if v == 0:
                r += 1
                continue
            while r > 15:
                tokens.append(("sym", 0xF0))
                r -= 16
            s, vb = _magnitude(v)
            tokens.append(("sym", (r << 4) | s))
            tokens.append(("raw", vb, s))
            r = 0
        if last < 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _eob_tokens(tokens, eobrun, [])
    _eob_tokens(tokens, eobrun, [])
    return tokens


def _ac_refine_tokens(blocks: list[np.ndarray], al: int) -> list:
    """Token stream for a progressive AC refinement scan (Ah=al+1 -> Al=al):
    correction bits for history-nonzero coefficients ride their governing
    symbol (ZRL / newly-significant / EOB run), per T.81 G.1.2.3 and the
    libjpeg buffered-bits discipline our decoder's _ac_refine_unit mirrors."""
    tokens: list = []
    eobrun = 0
    be_bits: list = []  # corrections deferred with the pending EOB run
    for q in blocks:
        absv = [abs(int(q[k])) >> al for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        r = 0
        br: list = []  # corrections pending within the current block
        for k in range(1, 64):
            temp = absv[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                eobrun, be_bits = _eob_tokens(tokens, eobrun, be_bits)
                tokens.append(("sym", 0xF0))
                r -= 16
                for b in br:
                    tokens.append(("raw", b, 1))
                br = []
            if temp > 1:  # history-nonzero: correction bit only
                br.append(temp & 1)
                continue
            eobrun, be_bits = _eob_tokens(tokens, eobrun, be_bits)
            tokens.append(("sym", (r << 4) | 1))
            tokens.append(("raw", 1 if int(q[k]) >= 0 else 0, 1))
            for b in br:
                tokens.append(("raw", b, 1))
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF:
                eobrun, be_bits = _eob_tokens(tokens, eobrun, be_bits)
    _eob_tokens(tokens, eobrun, be_bits)
    return tokens


def _encode_progressive(h, w, gray, comps, qts, qblocks):
    """SOF2 stream from per-component quantized zigzag blocks (fixture
    scope: hi=vi=1). Scan plan exercises all four scan types the decoder
    implements: interleaved DC first (Al=1) -> DC refine (raw bits) ->
    per-component AC first (Ss=1..63, Al=1) -> per-component AC refine
    (Ah=1, Al=0). Each entropy-coded scan carries its own DHT (table 0)."""
    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, qt in qts.items():
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in qt
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hi, vi, tq in comps:
        out += bytes([cid, (hi << 4) | vi, tq])

    def emit_scan(tokens, scan_cids, ss, se, ah, al, tc):
        syms = [t[1] for t in tokens if t[0] == "sym"]
        enc = None
        if syms:  # refinement-only scans code no Huffman symbols
            bits, huffval, enc = _fixed_length_table(syms)
            out.extend(
                b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
                + bytes([tc << 4]) + bytes(bits) + huffval
            )
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_cids), len(scan_cids)))
        for cid in scan_cids:
            out.extend(bytes([cid, 0x00]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        wr = _BitWriter()
        for t in tokens:
            if t[0] == "sym":
                code, ln = enc[t[1]]
                wr.write(code, ln)
            else:
                wr.write(t[1], t[2])
        wr.flush()
        out.extend(wr.out)

    nblocks = len(qblocks[0])
    all_cids = [c[0] for c in comps]

    # scan 1: DC first, interleaved, Al=1 (value = coeff arithmetic >> 1)
    tokens: list = []
    preds = [0] * len(comps)
    for b in range(nblocks):
        for ci in range(len(comps)):
            v = int(qblocks[ci][b][0]) >> 1
            t, vb = _magnitude(v - preds[ci])
            preds[ci] = v
            tokens.append(("sym", t))
            if t:
                tokens.append(("raw", vb, t))
    emit_scan(tokens, all_cids, 0, 0, 0, 1, 0)

    # scan 2: DC refine, interleaved, Ah=1 Al=0 — one raw bit per block
    tokens = []
    for b in range(nblocks):
        for ci in range(len(comps)):
            tokens.append(("raw", int(qblocks[ci][b][0]) & 1, 1))
    emit_scan(tokens, all_cids, 0, 0, 1, 0, 0)

    # per-component AC first (Al=1) then AC refine (Ah=1 -> Al=0)
    for ci, cid in enumerate(all_cids):
        emit_scan(_ac_first_tokens(qblocks[ci], 1), [cid], 1, 63, 0, 1, 1)
    for ci, cid in enumerate(all_cids):
        emit_scan(_ac_refine_tokens(qblocks[ci], 0), [cid], 1, 63, 1, 0, 1)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder (fixtures / egress)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Spec-valid Huffman table giving every used symbol the same code
    length L (2^L - 1 >= n keeps the all-ones code unused, as T.81
    requires). Simple, canonical, and enough for fixtures — real encoders
    optimize lengths, which changes size, not validity."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bits, bytes(syms), enc


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(
    px: np.ndarray,
    quality: int | None = None,
    luma_q: np.ndarray | None = None,
    chroma_q: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal spec-valid baseline JPEG encoder for fixtures/round-trips:
    (h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 -> JFIF bytes.

    ``quality`` scales the Annex-K tables (1..100, libjpeg convention);
    explicit ``luma_q``/``chroma_q`` (64 zigzag-order ints) override it —
    all-ones tables make the round-trip DCT-rounding-exact, which is what
    the decode tests pin. ``subsample=True`` emits 4:2:0 (2x2-mean chroma),
    exercising the decoder's upsampling path. ``restart_interval`` > 0
    emits a DRI segment plus RSTn markers every that-many MCUs (and resets
    the DC predictors), exercising the decoder's restart resynchronization.

    ``progressive=True`` emits SOF2 with an 8-scan successive-approximation
    plan (DC first Al=1 interleaved -> DC refine raw bits -> per-component
    AC first Ss=1..63 Al=1 -> per-component AC refine Ah=1), exercising all
    four progressive scan types the decoder implements. Fixture scope:
    4:4:4/grayscale only (no subsample/restart in progressive mode).
    """
    px = np.asarray(px, dtype=np.uint8)
    if progressive and (subsample or restart_interval):
        raise ValueError(
            "fixture encoder emits progressive only as 4:4:4/gray without restarts"
        )
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    h, w = px.shape[:2]
    if quality is not None:
        scale = 5000 // quality if quality < 50 else 200 - 2 * quality
        lq = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)
        cq = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    else:
        lq = _STD_LUMA_Q if luma_q is None else np.asarray(luma_q, dtype=np.int64)
        cq = _STD_CHROMA_Q if chroma_q is None else np.asarray(chroma_q, dtype=np.int64)

    if gray:
        ycc = px[:, :, None].astype(np.float64)
        comps = [(1, 1, 1, 0)]
        qts = {0: lq}
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ycc = np.stack([y, cb, cr], axis=2)
        if subsample:
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        qts = {0: lq, 1: cq}

    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # component planes, edge-replicated to the MCU grid
    def plane_for(ci: int, hi: int, vi: int) -> np.ndarray:
        p = ycc[:, :, ci]
        if hi != h_max or vi != v_max:  # 2x2 mean subsample (4:2:0)
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2
            padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = padded.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        th = mcus_y * 8 * vi
        tw = mcus_x * 8 * hi
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")

    planes = [plane_for(i, c[1], c[2]) for i, c in enumerate(comps)]

    if progressive:
        # quantized zigzag blocks per comp in raster order (hi=vi=1 here)
        qblocks: list[list[np.ndarray]] = [[] for _ in comps]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (cid, hi, vi, tq) in enumerate(comps):
                    block = planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                    zz = (_C @ block @ _C.T).reshape(64)[_ZIGZAG]
                    qblocks[ci].append(np.round(zz / qts[tq]).astype(np.int64))
        return _encode_progressive(h, w, gray, comps, qts, qblocks)

    # forward DCT + quantize every block, gather symbols for the tables
    all_tokens = []  # (mcu_idx, comp_kind, (dc_size, dc_bits), [(ac_sym, bits, size), ...])
    preds = [0] * len(comps)
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                preds = [0] * len(comps)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = _C @ block @ _C.T
                        zz = coef.reshape(64)[_ZIGZAG]
                        q = np.round(zz / qts[tq]).astype(np.int64)
                        # DC diff
                        diff = int(q[0]) - preds[ci]
                        preds[ci] = int(q[0])
                        t, bits_v = _magnitude(diff)
                        kind = 0 if tq == 0 else 1
                        dc_syms[kind].append(t)
                        acs = []
                        run = 0
                        last_nz = max((k for k in range(1, 64) if q[k]), default=0)
                        for k in range(1, 64):
                            v = int(q[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                acs.append((0xF0, 0, 0))
                                ac_syms[kind].append(0xF0)
                                run -= 16
                            s, vb = _magnitude(v)
                            acs.append(((run << 4) | s, vb, s))
                            ac_syms[kind].append((run << 4) | s)
                            run = 0
                            if k == last_nz:
                                break
                        if last_nz < 63:
                            acs.append((0x00, 0, 0))  # EOB
                            ac_syms[kind].append(0x00)
                        all_tokens.append((mcu_idx, kind, (t, bits_v), acs))

    kinds = [0] if gray else [0, 1]
    dc_tabs = {k: _fixed_length_table(dc_syms[k] or [0]) for k in kinds}
    ac_tabs = {k: _fixed_length_table(ac_syms[k] or [0]) for k in kinds}

    wr = _BitWriter()
    prev_mcu = 0
    rst_count = 0
    for mcu_idx, kind, (t, bits_v), acs in all_tokens:
        if (
            restart_interval
            and mcu_idx != prev_mcu
            and mcu_idx % restart_interval == 0
        ):
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + rst_count % 8])
            rst_count += 1
        prev_mcu = mcu_idx
        code, ln = dc_tabs[kind][2][t]
        wr.write(code, ln)
        if t:
            wr.write(bits_v, t)
        for sym, vb, s in acs:
            code, ln = ac_tabs[kind][2][sym]
            wr.write(code, ln)
            if s:
                wr.write(vb, s)
    wr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in qts.items():
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in qt
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hi, vi, tq in comps:
        out += bytes([cid, (hi << 4) | vi, tq])
    for k in kinds:
        for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
            bits, huffval, _ = tabs[k]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + bytes(
                [(tc << 4) | k]
            ) + bytes(bits) + huffval
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, hi, vi, tq in comps:
        k = 0 if tq == 0 else 1
        out += bytes([cid, (k << 4) | k])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
