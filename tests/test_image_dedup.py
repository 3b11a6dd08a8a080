"""Image pHash near-dup detection (operators/image_dedup.py, r10):
hash robustness under the planted transforms, separation between
unrelated scenes, decode quarantine, and the end-to-end pair set.
(Oracle parity for the contract query itself is covered by
test_oracle_parity.)"""

from __future__ import annotations

import numpy as np
import pytest

from etl_npl_pipeline_spark.operators.image_dedup import (
    _payload_pixels,
    _render_scene,
    build_scene_media_frame,
    image_near_dups,
    image_phash_signatures,
    phash64,
)
from etl_npl_pipeline_spark.operators.multimodal import (
    encode_jpeg,
    encode_png,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariants_on_planted_transforms():
    """Per-transform hamming stays within the blocking radius (≤ 7)
    and unrelated scenes stay far outside it — the separation the
    contract oracle's exact pair-set equality rests on."""
    reenc, resize, hashes = [], [], []
    for g in range(60):
        w, h = 128 + g % 64, 96 + g % 48
        base = _render_scene(f"t-{g}", w, h)
        h0 = phash64(_payload_pixels(encode_png(base.tobytes(), w, 0)))
        h1 = phash64(
            _payload_pixels(encode_jpeg(base.tobytes(), w, quant=4))
        )
        w2, h2 = (w + 1) // 2, (h + 1) // 2
        half = _render_scene(f"t-{g}", w2, h2)
        h2_ = phash64(_payload_pixels(encode_png(half.tobytes(), w2, 0)))
        reenc.append(_ham(h0, h1))
        resize.append(_ham(h0, h2_))
        hashes.append(h0)
    assert max(reenc) <= 7, reenc
    assert max(resize) <= 7, resize
    cross = [
        _ham(a, b)
        for i, a in enumerate(hashes)
        for b in hashes[i + 1 :]
    ]
    assert min(cross) > 7, min(cross)


def test_phash_brightness_invariance():
    """Median thresholding makes the hash invariant to affine
    brightness shifts (the classic pHash property)."""
    pix = _render_scene("bright", 160, 120)
    shifted = np.clip(pix.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    assert _ham(phash64(pix), phash64(shifted)) <= 2


def test_phash_small_images_upsample_path():
    """Inputs below 32 px on a side still hash (fractional-area
    weights spread one pixel over several cells)."""
    pix = _render_scene("tiny", 20, 12)
    v = phash64(pix)
    assert isinstance(v, int) and -(1 << 63) <= v < 1 << 63
    # same scene at a decodable resolution stays near
    big = _render_scene("tiny", 160, 96)
    assert _ham(v, phash64(big)) <= 12  # coarse sampling, wider slack


def test_payload_pixels_quarantine():
    assert _payload_pixels(None) is None
    assert _payload_pixels(b"not an image at all") is None
    # truncated PNG: magic matches, body doesn't parse -> None
    png = encode_png(_render_scene("q", 64, 48).tobytes(), 64, 0)
    assert _payload_pixels(png[:40]) is None
    # intact containers decode
    assert _payload_pixels(png) is not None


def test_signatures_drop_undecodable_rows(spark):
    rows = [
        (1, bytes(encode_png(_render_scene("a", 64, 48).tobytes(), 64, 0))),
        (2, b"garbage"),
        (3, None),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_phash_signatures(media).collect()
    assert [r.doc for r in out] == [1]


def test_image_near_dups_end_to_end(spark, sf_dir):
    """The full chain on the contract fixture: found pairs == the
    planted (base, transform) pairs, hamming column within radius."""
    from etl_npl_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 80) & F.col("text").isNotNull()
    )
    media = build_scene_media_frame(docs)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_near_dups(media, max_hamming=7).collect()
    }
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    want = {
        (4 * k, 4 * k + 1)
        for k in range(20)
        if 4 * k in ids and 4 * k + 1 in ids
    }
    assert set(got) == want and len(want) > 0
    assert all(0 <= h <= 7 for h in got.values())
