"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Two decode paths:

- REAL stdlib codecs for BMP, WAV, and PNG: genuine container
  formats encoded and parsed byte-for-byte (``encode_bmp``/
  ``_decode_bmp``, ``encode_wav``/``_decode_wav``, ``encode_png``/
  ``_decode_png``) — no library needed, dispatched on magic bytes
  by ``sniff_and_decode``. PNG is a full compressed round trip:
  zlib-inflated IDAT, all five scanline filters unapplied, CRCs
  checked.
- A clearly marked STUB (`_decode_stub`) for formats whose decoders
  need a codec library absent from this container (JPEG/MP4):
  deterministic fake features derived from payload bytes. Swap it
  for a PIL/ffmpeg call in a codec-equipped image and nothing else
  changes.

Scale notes: media payloads ride as parquet binary; decode is
map-only (no shuffle), Arrow moves each batch once, and columns
prune so a metadata-only query never deserializes payload bytes.
"""

from __future__ import annotations

import zlib
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


def _rolling_checksum(data: bytes) -> int:
    checksum = 0
    for b in data:
        checksum = (checksum * 31 + b) % 1_000_000_007
    return checksum


def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder: deterministic fake (width, height, n_frames,
    checksum) from the payload bytes. Used for formats that need a
    codec library (JPEG/PNG/MP4...) — see decode_media."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 16 + 1, _rolling_checksum(payload))


# --- real stdlib codecs: BMP and WAV headers need no library -------

def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bpp BMP container around raw pixel bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, no compression)."""
    off = 54
    size = off + len(pixels)
    file_header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    info_header = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")   # planes
        + (24).to_bytes(2, "little")  # bpp
        + bytes(24)                   # compression..palette, all 0
    )
    return file_header + info_header + pixels


def _decode_bmp(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse a BMP header: (kind, width, height, 1 frame, checksum
    of the pixel section). Validates explicitly — python slicing is
    tolerant (a short buffer yields empty slices, not errors), so a
    truncated header would otherwise "decode" to zeros instead of
    routing to the corrupt quarantine."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = abs(int.from_bytes(payload[22:26], "little", signed=True))
    data_off = int.from_bytes(payload[10:14], "little")
    if data_off < 54 or data_off > len(payload):
        raise ValueError("BMP pixel offset outside payload")
    return ("image/bmp", width, height, 1, _rolling_checksum(payload[data_off:]))


def encode_wav(
    samples: bytes, sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """Minimal PCM-16 WAV container around raw sample bytes (must be
    an even number of bytes for 16-bit samples)."""
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")  # bits/sample
    )
    data = b"data" + len(samples).to_bytes(4, "little") + samples
    riff_size = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt + data


def _decode_wav(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse a WAV header by walking RIFF chunks: (kind,
    sample_rate as 'width', channels as 'height', n_samples as
    'n_frames', checksum of the data section)."""
    channels, rate, n_samples, data_chk = 1, 0, 0, 0
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            n_samples = csize // (channels * 2)
            data_chk = _rolling_checksum(body)
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if rate == 0:
        raise ValueError("WAV without a fmt chunk")
    return ("audio/wav", rate, channels, n_samples, data_chk)


# --- real stdlib codec: PNG (zlib IDAT + scanline filters) ---------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _filter_scanline(ftype: int, row: bytes, prior: bytes) -> bytes:
    """Apply a PNG filter (encode direction), bpp=1 grayscale."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - 1] if i > 0 else 0          # left
        b = prior[i] if prior else 0            # up
        c = prior[i - 1] if prior and i > 0 else 0  # up-left
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # 4: Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def encode_png(pixels: bytes, width: int, filter_type: int = 0) -> bytes:
    """Minimal 8-bit grayscale PNG around raw pixel bytes: IHDR +
    one zlib IDAT + IEND, real CRCs. The last row is zero-padded to
    ``width``; ``filter_type`` picks the per-scanline filter (0-4),
    exercising every unfilter path in the decoder."""
    height = (len(pixels) + width - 1) // width if pixels else 0
    padded = pixels + bytes(width * height - len(pixels))
    raw = bytearray()
    prior = b""
    for r in range(height):
        row = padded[r * width : (r + 1) * width]
        raw += bytes([filter_type]) + _filter_scanline(filter_type, row, prior)
        prior = row
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])  # depth 8, grayscale, deflate, adaptive, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[str, int, int, int, int, int]:
    """Full PNG decode (8-bit grayscale, non-interlaced): walk
    chunks with CRC verification, inflate the concatenated IDAT
    stream, unapply all five scanline filters. Returns (kind,
    n_bytes, width, height, 1, checksum) where n_bytes is the
    DECODED pixel-buffer size (width*height — the content measure;
    container size varies with compression) and checksum folds the
    reconstructed pixels, so a decode bug cannot reproduce it."""
    width, height, recon = _png_pixels(payload)
    return (
        "image/png",
        width * height,
        width,
        height,
        1,
        _rolling_checksum(bytes(recon)),
    )


def _png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """The reconstruction core of _decode_png: returns (width,
    height, pixel buffer) so pixel-level ops (resize) can reuse the
    real decode path."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        crc = int.from_bytes(payload[pos + 8 + clen : pos + 12 + clen], "big")
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            if body[8] != 8 or body[9] != 0 or body[12] != 0:
                raise ValueError("only 8-bit grayscale non-interlaced PNG")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    raw = zlib.decompress(bytes(idat))
    recon = bytearray()
    stride = width
    for r in range(height):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype, row = line[0], bytearray(line[1:])
        if ftype == 0:  # fast path: no per-byte loop needed
            recon += row
            continue
        for i in range(stride):
            a = row[i - 1] if i > 0 else 0  # left, already reconstructed
            b = recon[(r - 1) * stride + i] if r > 0 else 0
            c = recon[(r - 1) * stride + i - 1] if r > 0 and i > 0 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad PNG filter {ftype}")
            row[i] = (row[i] + pred) & 0xFF
        recon += row
    return (width, height, bytes(recon))


def sniff_and_decode(payload: bytes) -> tuple[str, int | None, int, int, int, int]:
    """Dispatch on magic bytes: BMP, WAV, and PNG decode for real
    (stdlib); anything else falls back to the stub. Returns (kind,
    n_bytes | None, width, height, n_frames, checksum) — n_bytes is
    None when the container size from the metadata is the right
    measure (BMP/WAV/stub); PNG reports its decoded size.

    A payload whose magic matches but whose body doesn't parse
    (truncated header, CRC mismatch, bad inflate) QUARANTINES as
    ``corrupt/unreadable`` instead of raising: at corpus scale one
    bad file must never kill a million-row decode stage — the kind
    column is the dead-letter routing key, and the checksum (over
    the raw payload) still identifies the offender."""
    try:
        if payload[:2] == b"BM":
            k, w, h, f, chk = _decode_bmp(payload)
            return (k, None, w, h, f, chk)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            k, w, h, f, chk = _decode_wav(payload)
            return (k, None, w, h, f, chk)
        if payload[: len(_PNG_SIG)] == _PNG_SIG:
            return _decode_png(payload)
    except Exception:
        return ("corrupt/unreadable", None, 0, 0, 0, _rolling_checksum(payload))
    w, h, f, chk = _decode_stub(payload)
    return ("unknown/stub", None, w, h, f, chk)


def decode_media(
    media: DataFrame, use_real_codec: bool = False, codec: str = "stub"
) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    Arrow delivers column batches; each batch is processed in one
    Python call (not per-row). ``codec``:

    - ``"stub"`` (default): deterministic fake features — stands in
      for formats whose decoders need a library (JPEG/MP4).
    - ``"sniff"``: REAL decode for BMP, WAV, and PNG payloads
      (stdlib parsers, see _decode_bmp/_decode_wav/_decode_png),
      stub fallback for unrecognized magic; the emitted ``kind`` is
      the detected one. PNG rows report n_bytes as the DECODED
      pixel-buffer size (container size varies with compression);
      other kinds keep the metadata's container size.

    ``use_real_codec=True`` additionally demands a library-backed
    decoder (PIL) for the non-BMP/WAV formats and raises when the
    container lacks one.
    """
    if use_real_codec and not _HAS_PIL:
        raise NotImplementedError(
            "library-backed media decode needs PIL/ffmpeg, not present "
            "in this container — BMP/WAV/PNG decode for real via "
            "codec='sniff'; JPEG/MP4 use the deterministic stub"
        )
    sniff = codec == "sniff"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if sniff:
                decoded = [sniff_and_decode(p) for p in pdf["payload"]]
                kinds = [d[0] for d in decoded]
                n_bytes = [
                    d[1] if d[1] is not None else m
                    for d, m in zip(decoded, pdf["n_bytes"])
                ]
                feats = [d[2:] for d in decoded]
            else:
                kinds = list(pdf["kind"])
                n_bytes = list(pdf["n_bytes"])
                feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": kinds,
                    "n_bytes": n_bytes,
                    "width": [d[0] for d in feats],
                    "height": [d[1] for d in feats],
                    "n_frames": [d[2] for d in feats],
                    "checksum": [d[3] for d in feats],
                }
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(batches, schema=DECODED_SCHEMA)


def build_real_media_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Encode each doc's text bytes into a REAL media container —
    BMP for ids ≡0, WAV for ids ≡1, PNG for ids ≡2 (mod 3) — via
    mapInPandas. Width/height (BMP/PNG) and sample count (WAV)
    derive deterministically from the byte length, so a SQL oracle
    can verify the decoded output without seeing the bytes. The PNG
    filter type cycles with the id (0/1/2/4), so the decoder's
    unfilter paths all run on real data."""
    flat = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if doc_id % 3 == 0:
                    w, h = len(data) % 640 + 1, len(data) % 480 + 1
                    payloads.append(encode_bmp(data, w, h))
                elif doc_id % 3 == 1:
                    even = data[: len(data) - (len(data) % 2)]
                    payloads.append(encode_wav(even, 16_000, 1))
                else:
                    w = len(data) % 640 + 1
                    ftype = (0, 1, 2, 4)[(doc_id // 3) % 4]
                    payloads.append(encode_png(data, w, filter_type=ftype))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    enc = flat.mapInPandas(batches, schema="doc_id BIGINT, payload BINARY")
    return enc.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("application/octet-stream").alias("kind"),
            F.octet_length("payload").alias("n_bytes"),
        ).alias("meta"),
    )


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


RESIZED_SCHEMA = (
    "doc_id BIGINT, kind STRING, width INT, height INT, "
    "resized BOOLEAN, checksum BIGINT"
)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Image resize (nearest-neighbor downsample by an integer
    factor) over binary payloads via mapInPandas — the third leg of
    the decode / feature-extract / resize / frame-sample quartet.

    PNG payloads resize for REAL: decode through the stdlib path
    (_png_pixels — zlib IDAT, CRCs, unfilters), stride-``factor``
    sample the pixel grid (out dims = ceil(in/factor)), checksum the
    resampled buffer. BMP payloads in this corpus carry a pixel
    section that is raw text bytes, NOT width*height*3 — their
    declared geometry doesn't describe the buffer, so resampling
    them would be arithmetic on a lie; they pass through unchanged
    with ``resized = false`` (as do WAV/unknown payloads — resize is
    an image op).

    Scale shape: map-only (one Arrow batch per call, no shuffle);
    the pixel work is O(pixels) per payload and embarrassingly
    parallel across partitions — the same plumbing a
    library-backed decoder (PIL/ffmpeg) would ride.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds, widths, heights, resized, checksums = [], [], [], [], []
            for p in pdf["payload"]:
                if p[: len(_PNG_SIG)] == _PNG_SIG:
                    try:
                        w, h, pix = _png_pixels(p)
                    except Exception:
                        # same quarantine contract as sniff_and_decode:
                        # a corrupt file routes, never kills the stage
                        kinds.append("corrupt/unreadable")
                        widths.append(0)
                        heights.append(0)
                        resized.append(False)
                        checksums.append(_rolling_checksum(p))
                        continue
                    nw, nh = (w + factor - 1) // factor, (h + factor - 1) // factor
                    small = b"".join(
                        pix[r * w : r * w + w : factor]
                        for r in range(0, h, factor)
                    )
                    kinds.append("image/png")
                    widths.append(nw)
                    heights.append(nh)
                    resized.append(True)
                    checksums.append(_rolling_checksum(small))
                else:
                    kind, _, w, h, _, chk = sniff_and_decode(p)
                    kinds.append(kind)
                    widths.append(w)
                    heights.append(h)
                    resized.append(False)
                    checksums.append(chk)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": kinds,
                    "width": widths,
                    "height": heights,
                    "resized": resized,
                    "checksum": checksums,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )
