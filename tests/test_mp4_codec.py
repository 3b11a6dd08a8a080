"""Byte-level tests for the stdlib ISO BMFF (MP4) codec —
encode_mp4 writes a genuine ftyp/mdat/moov file, _decode_mp4 walks
the box tree and extracts the sample stream via stsz/stco."""

from __future__ import annotations

import pytest

from etl_npl_pipeline_spark.operators.multimodal import (
    _decode_mp4,
    _rolling_checksum,
    _walk_boxes,
    encode_mp4,
    sniff_and_decode,
)


def test_round_trip_ragged_last_sample():
    data = b"abcdefgh" * 33  # 264 bytes -> 4x64 + 8 ragged
    p = encode_mp4(data, 320, 240)
    kind, nb, w, h, n, chk = _decode_mp4(p)
    assert (kind, nb, w, h, n) == ("video/mp4v", 264, 320, 240, 5)
    assert chk == _rolling_checksum(data)


def test_round_trip_exact_multiple():
    data = b"\x00\x01\x02\x03" * 32  # exactly 2 samples of 64
    _, nb, _, _, n, chk = _decode_mp4(encode_mp4(data, 16, 16))
    assert (nb, n) == (128, 2)
    assert chk == _rolling_checksum(data)


def test_single_byte_and_empty():
    _, nb, _, _, n, _ = _decode_mp4(encode_mp4(b"x", 16, 16))
    assert (nb, n) == (1, 1)
    # empty data is written as one NUL sample
    _, nb, _, _, n, chk = _decode_mp4(encode_mp4(b"", 16, 16))
    assert (nb, n) == (1, 1)
    assert chk == _rolling_checksum(b"\x00")


def test_box_walk_top_level_layout():
    p = encode_mp4(b"hello world", 20, 10)
    types = [t for t, _, _ in _walk_boxes(p, 0, len(p))]
    assert types == [b"ftyp", b"mdat", b"moov"]


def test_largesize_box_parses():
    # rewrite mdat with a 64-bit largesize header; decoder must
    # still find moov beyond it and stco offsets shift by 8
    data = b"q" * 70
    p = encode_mp4(data, 16, 16)
    ftyp_end = 24
    mdat_size = int.from_bytes(p[ftyp_end : ftyp_end + 4], "big")
    mdat_body = p[ftyp_end + 8 : ftyp_end + mdat_size]
    big = (
        (1).to_bytes(4, "big")
        + b"mdat"
        + (16 + len(mdat_body)).to_bytes(8, "big")
        + mdat_body
    )
    rest = p[ftyp_end + mdat_size :]
    # fix stco: samples moved +8
    old_off = (32).to_bytes(4, "big")
    idx = rest.find(b"stco")
    assert idx > 0
    fixed = (
        rest[: idx + 12] + (40).to_bytes(4, "big") + rest[idx + 16 :]
    )
    assert rest[idx + 12 : idx + 16] == old_off
    p2 = p[:ftyp_end] + big + fixed
    _, nb, _, _, n, chk = _decode_mp4(p2)
    assert (nb, n) == (70, 2)
    assert chk == _rolling_checksum(data)


def test_corrupt_quarantines_via_sniff():
    p = bytearray(encode_mp4(b"data" * 40, 16, 16))
    p[0:4] = (10**9).to_bytes(4, "big")  # absurd box size
    kind, *_ = sniff_and_decode(bytes(p))
    assert kind == "corrupt/unreadable"


def test_truncated_mdat_raises():
    p = encode_mp4(b"z" * 200, 16, 16)
    # chop the file inside mdat: stco/stsz in moov are gone entirely
    with pytest.raises(Exception):
        _decode_mp4(p[:100])


def test_sniff_dispatches_on_ftyp_magic():
    p = encode_mp4(b"movie bytes here", 32, 24)
    kind, nb, w, h, n, chk = sniff_and_decode(p)
    assert kind == "video/mp4v"
    assert (w, h, n) == (32, 24, 1)
    assert nb == 16


def test_largesize_below_header_min_quarantines():
    # a 64-bit largesize in [8, 16) would make the body interval
    # reversed; the walker must reject it (routes to corrupt via
    # sniff), never "decode" zeroed fields from empty slices
    p = encode_mp4(b"x" * 50, 16, 16)
    bad = bytearray(p)
    bad[0:4] = (1).to_bytes(4, "big")  # ftyp becomes largesize box
    bad[8:16] = (12).to_bytes(8, "big")  # < 16: invalid
    kind, *_ = sniff_and_decode(bytes(bad[:4] + b"ftyp" + bad[8:]))
    assert kind == "corrupt/unreadable"


def test_video_frame_sample_every_1_matches_full_decode(spark):
    """The sample-table walker in video_frame_sample and the one in
    _decode_mp4 must agree: sampling every 1st frame IS the full
    stream, so the chained checksum equals the decoder's."""
    import pandas as pd

    from etl_npl_pipeline_spark.operators.multimodal import (
        _decode_mp4,
        video_frame_sample,
    )

    texts = ["short", "x" * 64, "y" * 65, "z" * 200, "a" * 640 + "tail"]
    payloads = [encode_mp4(t.encode(), 32, 24) for t in texts]
    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "payload": payloads})
    )
    rows = {
        r["doc_id"]: r
        for r in video_frame_sample(media, every_nth=1).collect()
    }
    for i, p in enumerate(payloads):
        kind, total, w, h, n, chk = _decode_mp4(p)
        assert rows[i]["n_frames"] == n
        assert rows[i]["n_sampled"] == n
        assert rows[i]["sampled_bytes"] == total
        assert rows[i]["checksum"] == chk


def test_video_frame_sample_strides(spark):
    """1-in-3 over 5 frames keeps frames 0 and 3 — sizes and byte
    counts follow the 64-byte lattice with a ragged tail."""
    import pandas as pd

    from etl_npl_pipeline_spark.operators.multimodal import video_frame_sample

    data = bytes(range(256)) + b"EXTRA"  # 261 bytes -> 5 frames
    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "payload": [encode_mp4(data, 16, 16)]})
    )
    r = video_frame_sample(media, every_nth=3).collect()[0]
    assert r["n_frames"] == 5
    assert r["n_sampled"] == 2          # frames 0, 3
    assert r["sampled_bytes"] == 128    # both full 64-byte frames
