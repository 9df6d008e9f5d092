"""Baseline JPEG codec (kernel/jpegdec.py): DCT pixel parity.

The reference decodes DCTDecode streams with jpeg_decoder
(src/image.rs:140-143). IDCT rounding is implementation-defined within
T.81 tolerance, so the hard-parity cases are the mathematically exact
ones: DC-only (per-8x8-flat) blocks under unit quantization decode to
identical pixels in every conforming decoder. Textured blocks are
bounded at <=1/255 per sample (spec accuracy class)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark.kernel.jpegdec import (
    JpegError, decode_baseline_jpeg, encode_baseline_jpeg,
)


def test_flat_gray_roundtrip_exact():
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    data = encode_baseline_jpeg(img.tobytes(), 32, 24, 1)
    w, h, n, px = decode_baseline_jpeg(data)
    assert (w, h, n) == (32, 24, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(24, 32), img)


def test_textured_gray_within_spec_tolerance():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    data = encode_baseline_jpeg(img.tobytes(), 32, 24, 1)
    _, _, _, px = decode_baseline_jpeg(data)
    got = np.frombuffer(px, np.uint8).reshape(24, 32).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_flat_color_roundtrip():
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    rgb = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    data = encode_baseline_jpeg(rgb.tobytes(), 16, 16, 3)
    w, h, n, px = decode_baseline_jpeg(data)
    assert (w, h, n) == (16, 16, 3)
    got = np.frombuffer(px, np.uint8).reshape(16, 16, 3).astype(int)
    # YCbCr conversion adds one rounding step each way
    assert np.abs(got - rgb.astype(int)).max() <= 1


def test_non_multiple_of_8_dims():
    img = np.arange(10 * 13, dtype=np.uint8).reshape(10, 13) // 2 * 2
    img = (img // 16 * 16)  # flat-ish but not block aligned
    data = encode_baseline_jpeg(img.tobytes(), 13, 10, 1)
    w, h, _, px = decode_baseline_jpeg(data)
    assert (w, h) == (13, 10)
    got = np.frombuffer(px, np.uint8).reshape(10, 13).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(JpegError):
        decode_baseline_jpeg(b"\xff\xd8\xff\xe0fake\xff\xd9")
    # progressive SOF2 must be rejected, not mis-decoded
    flat = np.full((8, 8), 80, np.uint8)
    data = bytearray(encode_baseline_jpeg(flat.tobytes(), 8, 8, 1))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(JpegError):
        decode_baseline_jpeg(bytes(data))


def test_ff_byte_stuffing_roundtrip():
    """Coefficient patterns that emit 0xFF entropy bytes must be
    un-stuffed correctly."""
    rng = np.random.default_rng(6)
    for _ in range(5):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        data = encode_baseline_jpeg(img.tobytes(), 16, 16, 1)
        _, _, _, px = decode_baseline_jpeg(data)
        got = np.frombuffer(px, np.uint8).reshape(16, 16).astype(int)
        assert np.abs(got - img.astype(int)).max() <= 1


def test_decoder_never_hangs_on_fuzz():
    """Arbitrary byte soup must raise (JpegError or clean failure),
    never hang or return garbage silently."""
    import random

    rng = random.Random(99)
    flat = np.full((8, 8), 80, np.uint8)
    seed = encode_baseline_jpeg(flat.tobytes(), 8, 8, 1)
    for trial in range(60):
        data = bytearray(seed)
        for _ in range(rng.randrange(1, 6)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            w, h, n, px = decode_baseline_jpeg(bytes(data))
            assert 0 < w <= 1 << 16 and 0 < h <= 1 << 16
            assert len(px) in (w * h, w * h * 3)
        except (JpegError, IndexError, ValueError):
            pass  # clean structured failure
