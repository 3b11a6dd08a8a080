"""Pixel-level known-answer tests for resize_media (nearest-neighbor
downsample over the real PNG decode path)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators.multimodal import (
    _rolling_checksum,
    encode_bmp,
    encode_png,
    resize_media,
)


def test_resize_png_known_answer(spark):
    # 4x4 gradient: rows 0..3 = [r*4 .. r*4+3]
    pixels = bytes(range(16))
    payload = encode_png(pixels, width=4, filter_type=4)
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    )
    row = resize_media(df, factor=2).collect()[0]
    assert (row["kind"], row["width"], row["height"], row["resized"]) == (
        "image/png", 2, 2, True,
    )
    # stride-2 sample of the 4x4 grid: (0,0) (0,2) (2,0) (2,2)
    assert row["checksum"] == _rolling_checksum(bytes([0, 2, 8, 10]))


def test_resize_odd_dims_ceil(spark):
    # 5x3 image, factor 2 -> ceil dims 3x2, samples cols 0,2,4 rows 0,2
    pixels = bytes(range(15))
    payload = encode_png(pixels, width=5, filter_type=1)
    row = resize_media(
        spark.createDataFrame([(1, payload)], "doc_id long, payload binary"),
        factor=2,
    ).collect()[0]
    assert (row["width"], row["height"]) == (3, 2)
    assert row["checksum"] == _rolling_checksum(bytes([0, 2, 4, 10, 12, 14]))


def test_resize_non_image_passthrough(spark):
    payload = encode_bmp(b"raw-bytes-not-a-grid", 7, 5)
    row = resize_media(
        spark.createDataFrame([(9, payload)], "doc_id long, payload binary")
    ).collect()[0]
    assert row["resized"] is False
    assert (row["kind"], row["width"], row["height"]) == ("image/bmp", 7, 5)


def test_corrupt_payloads_quarantine_not_crash(spark):
    """One bad file must never kill the decode stage: corrupt
    payloads route to kind='corrupt/unreadable' with the raw-payload
    checksum; good rows in the same batch decode normally."""
    from etl_npl_pipeline_spark.operators.multimodal import decode_media

    good = encode_png(bytes(range(16)), width=4)
    bad_crc = bytearray(good)
    bad_crc[-10] ^= 0xFF  # flip a byte inside IEND/IDAT region
    truncated_bmp = encode_bmp(b"pixels", 3, 2)[:12]  # header cut short
    df = spark.createDataFrame(
        [(1, good), (2, bytes(bad_crc)), (3, truncated_bmp)],
        "doc_id long, payload binary",
    )
    media = df.withColumn(
        "meta",
        F.struct(
            F.lit("x").alias("kind"), F.octet_length("payload").alias("n_bytes")
        ),
    )
    rows = {r["doc_id"]: r for r in decode_media(media, codec="sniff").collect()}
    assert rows[1]["kind"] == "image/png" and rows[1]["width"] == 4
    assert rows[2]["kind"] == "corrupt/unreadable"
    assert rows[2]["checksum"] == _rolling_checksum(bytes(bad_crc))
    assert rows[3]["kind"] == "corrupt/unreadable"

    resized = {r["doc_id"]: r for r in resize_media(df).collect()}
    assert resized[1]["resized"] is True
    assert resized[2]["kind"] == "corrupt/unreadable"
    assert resized[2]["resized"] is False
