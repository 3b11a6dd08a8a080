"""Malformed-payload quarantine for the feature extractors: a
non-WAV / non-MP4 / truncated payload must yield a null-feature row
(doc_id preserved) instead of killing the executor — the
sniff_and_decode dead-letter convention extended to audio_features
and video_frame_sample. This is a scale requirement of THIS engine,
not reference parity: at corpus scale one unreadable payload must
never abort a whole stage, and the null-feature row keeps the
dead-letter attributable for audit."""

from __future__ import annotations

from etl_npl_pipeline_spark.operators.multimodal import (
    audio_features,
    encode_mp4,
    encode_wav,
    video_frame_sample,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")


def test_audio_features_quarantines_malformed(spark):
    good = encode_wav(b"ab" * 50, 16_000, 1)
    # RIFF/WAVE magic but no fmt chunk -> rate 0 -> quarantine
    no_fmt = b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"\x00" * 8
    rows = [
        (1, good),
        (2, b"not audio at all"),
        (3, no_fmt),
        (4, b""),
    ]
    out = {r["doc_id"]: r for r in audio_features(_media(spark, rows)).collect()}
    assert len(out) == 4
    assert out[1]["sample_rate"] == 16_000 and out[1]["n_samples"] == 50
    for bad in (2, 3, 4):
        assert out[bad]["sample_rate"] is None
        assert out[bad]["energy"] is None


def test_video_frame_sample_quarantines_malformed(spark):
    good = encode_mp4(b"frame" * 40, 64, 48)
    # valid-looking ftyp magic but no moov/stsz behind it
    stub = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 4
    rows = [(1, good), (2, b"junk"), (3, stub)]
    out = {
        r["doc_id"]: r
        for r in video_frame_sample(_media(spark, rows), every_nth=2).collect()
    }
    assert len(out) == 3
    assert out[1]["n_frames"] and out[1]["checksum"] is not None
    for bad in (2, 3):
        assert out[bad]["n_frames"] is None
        assert out[bad]["checksum"] is None


def test_good_rows_unchanged_next_to_quarantined(spark):
    """A corrupt neighbor in the same Arrow batch must not perturb a
    good row's features (shared-state bug guard)."""
    data = b"xy" * 64
    rows = [(1, encode_wav(data, 8_000, 1)), (2, b"\xff\xfe junk")]
    solo = audio_features(_media(spark, rows[:1])).collect()[0]
    paired = {
        r["doc_id"]: r for r in audio_features(_media(spark, rows)).collect()
    }[1]
    assert tuple(solo) == tuple(paired)
