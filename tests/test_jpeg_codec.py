"""Baseline JPEG codec pins: the full entropy pipeline (Huffman,
byte stuffing, dequantize, de-zigzag, IDCT) exercised at the bytes
level, plus the quarantine contract for corrupt streams."""

from __future__ import annotations

import numpy as np
import pytest

from etl_npl_pipeline_spark.operators.multimodal import (
    _jpeg_pixels,
    encode_jpeg,
    sniff_and_decode,
)


def test_block_constant_roundtrip_is_exact():
    """8x8-constant blocks survive the all-ones quant table EXACTLY
    (every gray level, both DC-diff signs along the sequence)."""
    data = bytes(range(256)) + bytes(reversed(range(256)))
    pix = b"".join(bytes([b]) * 64 for b in data)
    w, h, out = _jpeg_pixels(encode_jpeg(pix, 8))
    assert (w, h) == (8, 8 * len(data))
    assert out == pix


def test_arbitrary_content_within_one_gray_level():
    """General content (nonzero AC coefficients, ZRL runs, byte
    stuffing) reconstructs within +-1 per pixel at quant=1 — the
    DCT round-trip bound, not a stub."""
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(56, 40), dtype=np.uint8)
    w, h, out = _jpeg_pixels(encode_jpeg(arr.tobytes(), 40))
    assert (w, h) == (40, 56)
    got = np.frombuffer(out, np.uint8).reshape(56, 40).astype(int)
    assert np.abs(got - arr.astype(int)).max() <= 1


def test_non_multiple_of_8_dims_crop():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=11 * 13, dtype=np.uint8).tobytes()
    w, h, out = _jpeg_pixels(encode_jpeg(arr, 13))
    assert (w, h) == (13, 11)
    assert len(out) == 11 * 13


def test_smooth_gradient_is_lossless():
    """Ramps produce small AC coefficients that quant=1 preserves —
    decode must be bit-exact, pinning IDCT normalization."""
    g = np.tile(np.arange(64, dtype=np.uint8), 64).tobytes()
    _, _, out = _jpeg_pixels(encode_jpeg(g, 64))
    assert out == g


def test_sniff_dispatches_jpeg_magic():
    pix = bytes([7]) * 64
    kind, n_bytes, w, h, f, chk = sniff_and_decode(encode_jpeg(pix, 8))
    assert kind == "image/jpeg"
    assert (n_bytes, w, h, f) == (64, 8, 8, 1)
    want = 0
    for b in pix:
        want = (want * 31 + b) % 1_000_000_007
    assert chk == want


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:40],                        # truncated mid-header
        lambda b: b[:-10],                       # truncated entropy data
        lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive
    ],
)
def test_corrupt_jpeg_quarantines(mutate):
    payload = mutate(encode_jpeg(bytes([9]) * 64, 8))
    kind, *_ = sniff_and_decode(payload)
    assert kind == "corrupt/unreadable"
