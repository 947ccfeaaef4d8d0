"""Property-based round-trips for the in-repo codecs (JPEG, PNG, GIF, WAV,
MJPEG-in-MP4) over Hypothesis-generated random payloads.

These codecs carry the witness-pinned media queries (README §Verification
model): DuckDB cannot decode a JPEG, so first-write correctness of those
queries rests on these round-trips — fuzzing sizes, channel counts, and
encoder options (subsampling, restart markers, PNG filters) hardens that
foundation beyond the seeded fixtures in test_ops.py. Pure numpy, no
Spark session needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

FAST = settings(max_examples=12, deadline=None)


@FAST
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    color=st.booleans(),
    restart=st.sampled_from([0, 2, 5]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_random_images(h, w, color, restart, seed):
    from kgspark.ops import jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ones = np.ones(64, dtype=np.int64)
    kw = {"luma_q": ones}
    if color:
        kw["chroma_q"] = ones
    if restart:
        kw["restart_interval"] = restart
    got = jpeg.decode_jpeg(jpeg.encode_jpeg(px, **kw))
    assert got.shape == (h, w, 3 if color else 1)
    ref = px if color else px[:, :, None]
    # all-ones tables, no subsampling: loss is DCT float rounding only
    # (worst adversarial random block observed: 3/255)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 3


@FAST
@given(
    h=st.integers(2, 40),
    w=st.integers(2, 40),
    sy=st.integers(0, 7),
    sx=st.integers(0, 7),
    off=st.integers(0, 200),
)
def test_jpeg_roundtrip_420_smooth_gradients(h, w, sy, sx, off):
    """4:2:0 averages 2x2 chroma blocks, so it is only near-lossless on
    smooth content — random gradients here (random pixels would make the
    chroma loss unbounded by design, not by bug)."""
    from kgspark.ops import jpeg

    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            np.clip(yy * sy + off, 0, 255),  # clip, not mod: a mod-256 wrap
            np.clip(xx * sx + off, 0, 255),  # is a 255-step edge, not smooth
            np.clip((yy + xx) + off, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    ones = np.ones(64, dtype=np.int64)
    got = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px, luma_q=ones, chroma_q=ones, subsample=True)
    )
    assert got.shape == (h, w, 3)
    # gradient steps <= 7/channel: 2x2 chroma averaging deviates by at most
    # half a step per axis plus DCT rounding
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2 + sy + sx


@FAST
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_random_images(h, w, channels, filter_type, seed):
    from kgspark.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    got = decode_png(encode_png(px, filter_type=filter_type))
    assert got.shape == px.shape
    assert np.array_equal(got, px)  # PNG is lossless, bit-exact


@FAST
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    stereo=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_random_audio(n, rate, stereo, seed):
    """encode_wav is float-in [-1,1] -> 16-bit PCM; decode divides by
    32768, so the exact round-trip value is round(s*32767)/32768."""
    from kgspark.ops.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    samples = rng.uniform(-1.0, 1.0, size=shape)
    got, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    want = np.clip(np.round(samples * 32767.0), -32768, 32767) / 32768.0
    assert got.shape == (n, 2 if stereo else 1)
    assert np.array_equal(got, want.reshape(n, -1))


@FAST
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    ncolors=st.integers(2, 16),
    interlaced=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_random_indexed_images(h, w, ncolors, interlaced, seed):
    from kgspark.ops.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    got = decode_gif(encode_gif(idx, palette, interlaced=interlaced))
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, palette[idx])  # palette decode is bit-exact


@settings(max_examples=6, deadline=None)
@given(
    n_frames=st.integers(1, 5),
    h=st.integers(8, 24),
    w=st.integers(8, 24),
    fps=st.sampled_from([10, 30]),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjpeg_mp4_roundtrip_random_videos(n_frames, h, w, fps, seed):
    from kgspark.ops import jpeg
    from kgspark.ops.mp4 import decode_mp4_frames, encode_mjpeg_mp4

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    ones = np.ones(64, dtype=np.int64)
    payload = encode_mjpeg_mp4(frames, fps=fps, luma_q=ones, chroma_q=ones)
    decoded = decode_mp4_frames(payload)
    assert len(decoded) == n_frames
    for (i, got), src in zip(decoded, frames):
        assert got.shape == (h, w, 3)
        assert np.abs(got.astype(int) - src.astype(int)).max() <= 3
