"""Perceptual image hashing + near-duplicate image dedup.

Training corpora dedup images the same way they dedup text: a 64-bit
perceptual hash per payload, then a banded Hamming-distance join. The hash
is classic DCT pHash — decode (REAL stdlib/numpy decoders from
``ops.multimodal`` / ``ops.jpeg``) -> luma -> 32x32 area resample -> 2-D
orthonormal DCT -> top-left 8x8 low-frequency block -> median threshold
(DC excluded) -> 64 bits. Re-encodes of the same picture (format change,
JPEG requantization, mild noise) land within a few bits; unrelated
pictures differ in ~32.

The distributed shape mirrors text SimHash exactly, and the candidate
search IS the text machinery: ``dedup.simhash_neardup_pairs`` (pigeonhole
banding, JVM-side bit_count verify) applied to the phash column. One
Python stage for decode+hash (Arrow-batched, partition-preserving), then
everything is JVM joins — the same plan that survives 100 TB for text
near-dup survives here.

No SQL oracle exists for entropy decode, so the registry query pins a
golden-hash witness (``__spark_entry__._witnessed``) instead; the kernel
is pinned by pytest round-trips below and in tests/test_ops.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.ops.multimodal import decode_image_pixels

# orthonormal 32-point DCT-II basis (same construction as ops/jpeg._C)
_C32 = np.zeros((32, 32))
for _k in range(32):
    for _n in range(32):
        _C32[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 64.0) * (
            np.sqrt(1.0 / 32.0) if _k == 0 else np.sqrt(2.0 / 32.0)
        )


def _area_resample_32(gray: np.ndarray) -> np.ndarray:
    """(h, w) float -> (32, 32) by area-mean over index-partitioned blocks.

    Deterministic and partition-free: output cell (i, j) averages input
    rows [floor(i*h/32), floor((i+1)*h/32)) (at least one row), same for
    columns — no interpolation-library dependence.
    """
    h, w = gray.shape
    ri = (np.arange(33) * h) // 32
    ci = (np.arange(33) * w) // 32
    out = np.empty((32, 32))
    for i in range(32):
        r0, r1 = ri[i], max(ri[i + 1], ri[i] + 1)
        band = gray[min(r0, h - 1) : min(r1, h), :]
        if band.size == 0:
            band = gray[h - 1 : h, :]
        rowmean = band.mean(axis=0)
        for j in range(32):
            c0, c1 = ci[j], max(ci[j + 1], ci[j] + 1)
            seg = rowmean[min(c0, w - 1) : min(c1, w)]
            out[i, j] = seg.mean() if seg.size else rowmean[w - 1]
    return out


def phash64(payload: bytes, fake: bool = False) -> int:
    """64-bit DCT perceptual hash of an image payload (signed int64 range,
    matching Spark's ``long``). ``fake=True`` derives an md5 stand-in for
    undecodable payloads, mirroring ``multimodal.decode_image``."""
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        return int(np.frombuffer(digest[:8], dtype=np.int64)[0])
    px = decode_image_pixels(bytes(payload))
    gray = px.astype(np.float64).mean(axis=2)
    small = _area_resample_32(gray)
    coef = _C32 @ small @ _C32.T
    block = coef[:8, :8].reshape(64)
    med = np.median(block[1:])  # DC excluded from the threshold
    bits = block > med
    bits[0] = False  # DC bit forced 0 (always above median, carries nothing)
    return int(np.packbits(bits[::-1]).view(">u8")[0].astype(np.int64))


def with_phash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """(id, payload) -> (id, phash long): one Arrow-batched Python stage,
    input partitioning preserved (no shuffle). Undecodable payloads hash to
    NULL rather than failing the batch (the decoders' ValueError-only
    policy makes that routing safe on crawl data)."""
    cols = media.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                try:
                    out.append(phash64(bytes(payload), fake=fake))
                except (ValueError, NotImplementedError):
                    out.append(None)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": pd.array(out, dtype="Int64")})

    return cols.mapInPandas(run, schema=f"{id_col} long, phash long")


def make_neardup_media(spark, n: int) -> DataFrame:
    """Deterministic image table with planted near-duplicates: rows
    0..n-1 are distinct smooth sinusoid-mixture pictures (PNG); rows
    n..2n-1 re-encode the SAME pixels as row (i - n) as baseline JPEG
    quality 88 — different bytes, perceptually identical, the classic
    crawl near-dup. Executor-side generation (mapInPandas over range),
    same id -> same bytes everywhere."""
    from kgspark.ops.jpeg import encode_jpeg
    from kgspark.ops.multimodal import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:48, 0:64]
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(7000 + i % n)
                f = rng.uniform(4.0, 15.0, size=6)
                ph = rng.uniform(0, 6.28, size=3)
                px = np.stack(
                    [
                        128 + 100 * np.sin(yy / f[0] + ph[0]) * np.cos(xx / f[1]),
                        128 + 90 * np.cos(yy / f[2] + ph[1]) * np.sin(xx / f[3]),
                        128 + 80 * np.sin((xx + yy) / f[4] + ph[2]) * np.cos(yy / f[5]),
                    ],
                    axis=2,
                ).clip(0, 255).astype(np.uint8)
                payloads.append(
                    encode_png(px) if i < n else encode_jpeg(px, quality=88)
                )
            yield pd.DataFrame({"media_id": pdf["id"], "payload": payloads})

    return spark.range(2 * n).mapInPandas(
        gen, schema="media_id long, payload binary"
    )


def phash_neardup_pairs(
    hashed: DataFrame, id_col: str = "media_id", max_hamming: int = 10,
    n_bands: int = 16,
) -> DataFrame:
    """Near-duplicate image candidate pairs: the text SimHash banding
    machinery verbatim (pigeonhole 64/n_bands-bit bands -> same-band join ->
    exact JVM bit_count verify). n_bands=16 guarantees recall for
    hamming <= 15; returns (a, b, hamming) with a < b."""
    from kgspark.ops.dedup import simhash_neardup_pairs

    sigs = hashed.filter(F.col("phash").isNotNull()).select(
        F.col(id_col), F.col("phash").alias("simhash")
    )
    return simhash_neardup_pairs(
        sigs, id_col=id_col, max_hamming=max_hamming, n_bands=n_bands
    )
