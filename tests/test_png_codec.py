"""Stdlib PNG codec (operators.multimodal.encode_png/_decode_png):
full compressed round trip — zlib IDAT, CRC verification, and all
five scanline filters (None/Sub/Up/Average/Paeth) — no Spark
session needed (the Spark path is pinned by the mm_decode_real
oracle-parity test)."""

from __future__ import annotations

import pytest

from etl_npl_pipeline_spark.operators.multimodal import (
    _decode_png,
    _rolling_checksum,
    encode_png,
    sniff_and_decode,
)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "data",
    [
        b"hello png world" * 17,
        "héllo wörld €".encode() * 9,  # multibyte UTF-8
        b"x",
        b"",
    ],
)
def test_png_roundtrip_all_filters(ftype, data):
    w = max(len(data) % 7 + 1, 1)
    png = encode_png(data, w, filter_type=ftype)
    kind, n_bytes, pw, ph, n_frames, chk = _decode_png(png)
    padded = data + bytes(pw * ph - len(data))
    assert (kind, pw, n_frames) == ("image/png", w, 1)
    assert n_bytes == pw * ph  # decoded size, not container size
    assert chk == _rolling_checksum(padded)


def test_png_crc_corruption_detected():
    png = bytearray(encode_png(b"abcdef", 3))
    png[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(png))


def test_sniff_dispatches_png():
    png = encode_png(b"sniff me", 4, filter_type=4)
    kind, n_bytes, w, h, f, chk = sniff_and_decode(png)
    assert kind == "image/png" and (w, h) == (4, 2)
