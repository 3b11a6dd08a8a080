"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode itself is a
clearly marked STUB (`_decode_stub`) producing deterministic fake
features derived from the payload bytes; the Spark-side plumbing —
binary column handling, metadata struct schema, mapInPandas batch
shape, partition-parallel execution — is real and is what this
module demonstrates. Swap `_decode_stub` for a PIL/ffmpeg call in a
codec-equipped image and nothing else changes.

Scale notes: media payloads ride as parquet binary; decode is
map-only (no shuffle), Arrow moves each batch once, and columns
prune so a metadata-only query never deserializes payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_bytes INT, width INT, height INT, "
    "n_frames INT, checksum BIGINT"
)

try:  # codec libs are absent in this container — gate, don't crash
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def build_media_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a media table: payload as a binary column plus a typed
    metadata struct — the schema a real image/audio corpus uses
    (payload may also live in object storage with only the pointer
    here; the operators below don't care)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder: deterministic fake (width, height, n_frames,
    checksum) from the payload bytes. A real deployment decodes
    here (PIL / libav) — see decode_media for the gate."""
    n = len(payload)
    checksum = 0
    for b in payload:
        checksum = (checksum * 31 + b) % 1_000_000_007
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1, checksum)


def decode_media(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    Arrow delivers column batches; each batch is processed in one
    Python call (not per-row). ``use_real_codec=True`` requires a
    codec library and raises if unavailable — the stub path is the
    default in this container.
    """
    if use_real_codec and not _HAS_PIL:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg, not present in this "
            "container — run with use_real_codec=False for the "
            "deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": [k for k in pdf["kind"]],
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "checksum": [d[3] for d in decoded],
                }
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plumbing: explode a per-payload frame index
    range, keeping every Nth frame — the partition/batch shape of
    video frame extraction (the decode itself being stubbed)."""
    decoded = decode_media(media)
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
        "width",
        "height",
    )
