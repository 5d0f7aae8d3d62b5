"""Multimodal column plumbing: opaque media payloads through the engine.

Media enters as ``kind='media'``/``kind='embed'`` spans carrying an opaque
``media_ref``, plus (for payload-bearing tables) a ``binary`` column.
The Spark-side plumbing — schema, batch shape, partitioning, Arrow
transfer — is real and tested, and for PNG, GIF, BMP and WAV the DECODE
itself is real too: all four carry their metadata in fixed headers
parseable with stdlib ``struct`` from the first bytes (no PIL/ffmpeg
needed) — PNG signature + IHDR width/height (big-endian), GIF logical
screen descriptor width/height (little-endian) + positional block walk
for frame counts, BMP BITMAPINFOHEADER width/height (little-endian) over
an uncompressed raster, WAV RIFF/fmt byte-rate + data size → duration.
Formats whose
metadata needs a real codec (jpeg/mp4/...) remain DECLARED STUBS behind
``strict=True`` (default: an ``ok=false`` error-channel row — one stray
.jpg in a 10^12-row table must not kill the job), since no image/audio
libraries exist in this container:

* ``decode_media``           — ``fake=True`` (default): deterministic
  md5-derived "decode" so downstream operators are testable without
  payloads; ``fake=False`` + ``payload_col``: REAL header parse for
  .png/.wav via ``decode_media_payloads``; ``fake=False`` without a
  payload column raises (declared stub).
* ``extract_features``       — deterministic fake embedding (16 floats from
  md5 bytes), same mapInPandas shape a real CLIP/wav2vec stage would use.
* ``sample_frames``          — deterministic frame-offset plan for videos.

To productionize the remaining formats: add the codec call beside
``_parse_png``/``_parse_wav`` inside the same ``mapInPandas`` iterator —
the schema and partitioning don't change.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "width int, height int, duration_ms long, ok boolean"
)
# real header decode is keyed by media_ref (payload tables are ref-keyed;
# join back to spans on media_ref for per-document views)
PAYLOAD_DECODED_SCHEMA = (
    "media_ref string, media_type string, "
    "width int, height int, duration_ms long, ok boolean"
)
GIF_FRAMES_SCHEMA = (
    "media_ref string, width int, height int, n_frames int, ok boolean"
)
FEATURES_SCHEMA = "doc_id string, media_ref string, features array<float>"
FRAMES_SCHEMA = "doc_id string, media_ref string, frame_ms array<long>"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR header, or None if not a valid PNG
    prefix.  Layout: 8-byte signature, 4-byte chunk length, 'IHDR',
    width/height as big-endian uint32 at byte offsets 16/20."""
    if len(b) < 24 or b[:8] != _PNG_SIG or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return w, h


def _parse_gif(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the GIF logical screen descriptor, or None if
    not a valid GIF87a/GIF89a prefix.  Layout: 6-byte signature, width and
    height as little-endian uint16 at byte offsets 6/8 — fixed-header
    metadata, stdlib-parseable like PNG/WAV."""
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return w, h


def _gif_frame_count(b: bytes) -> int | None:
    """Number of image descriptors (frames) by walking the block stream —
    no LZW decompression needed: extensions (0x21) and image data are
    length-prefixed sub-blocks that can be skipped positionally.  None on
    a malformed stream (truncated block, unknown introducer)."""
    if _parse_gif(b) is None:
        return None
    pos = 10
    packed = b[10]
    # global color table: 3 * 2^(N+1) bytes when flag bit 7 is set
    pos = 13 + (3 << ((packed & 0x07) + 1) if packed & 0x80 else 0)
    frames = 0
    while pos < len(b):
        introducer = b[pos]
        if introducer == 0x3B:  # trailer
            return frames
        if introducer == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif introducer == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                return None
            lpacked = b[pos + 9]
            pos += 10 + (3 << ((lpacked & 0x07) + 1) if lpacked & 0x80 else 0)
            pos += 1  # LZW minimum code size byte
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            frames += 1
        else:
            return None
    return None  # ran off the end without a trailer


def _parse_bmp(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the BITMAPINFOHEADER, or None if not a valid
    24-bit uncompressed BMP prefix.  Layout: 'BM' signature, pixel-array
    offset at byte 10, width/height little-endian int32 at offsets 18/22,
    bpp uint16 at 28, compression uint32 at 30 — all fixed-header, stdlib
    parseable.  Only the subset the engine can fully decode (bpp=24,
    BI_RGB, positive height = bottom-up) reports a valid header, mirroring
    the SQL oracle's checks bit for bit."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    w = int.from_bytes(b[18:22], "little")
    h = int.from_bytes(b[22:26], "little")
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if w <= 0 or h <= 0 or h >= 1 << 31 or bpp != 24 or comp != 0:
        return None
    return w, h


def _parse_wav(b: bytes) -> int | None:
    """duration_ms from the canonical RIFF/fmt/data header, or None if not
    a valid PCM WAV prefix.  byte_rate is little-endian uint32 at offset
    28, data chunk size at offset 40; duration = data·1000 // byte_rate
    (integer division — exact in any engine)."""
    if (
        len(b) < 44
        or b[:4] != b"RIFF"
        or b[8:12] != b"WAVE"
        or b[12:16] != b"fmt "
        or b[36:40] != b"data"
    ):
        return None
    byte_rate = struct.unpack("<I", b[28:32])[0]
    data_size = struct.unpack("<I", b[40:44])[0]
    if byte_rate <= 0:
        return None
    return data_size * 1000 // byte_rate


def decode_media_payloads(
    media: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """REAL dependency-free decode of ``(media_ref, payload)`` rows for the
    formats whose metadata lives in fixed headers:

    * ``.png`` → (width, height) from IHDR, duration 0;
    * ``.gif`` → (width, height) from the logical screen descriptor,
      duration 0;
    * ``.bmp`` → (width, height) from the BITMAPINFOHEADER (24-bit
      BI_RGB subset), duration 0;
    * ``.wav`` → duration_ms from the RIFF header, width/height 0;
    * corrupt payload of a supported extension → ``ok=false``, NULL metrics
      (the error channel — never a thrown task);
    * any OTHER extension → ``ok=false`` row by default (one stray .jpg in
      a 10^12-row table must not kill the job); ``strict=True`` restores
      the loud NotImplementedError (declared stub: jpeg/mp4 metadata needs
      a real codec library, absent in this image).

    Arrow-batched mapInPandas, one pass, no shuffle — the same plumbing a
    PIL/ffmpeg deployment would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                mt = _media_type(ref)
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                b = bytes(payload) if payload is not None else b""
                if ext == "png":
                    wh = _parse_png(b)
                    if wh is None:
                        rows.append((ref, mt, None, None, None, False))
                    else:
                        rows.append((ref, mt, wh[0], wh[1], 0, True))
                elif ext == "gif":
                    wh = _parse_gif(b)
                    if wh is None:
                        rows.append((ref, mt, None, None, None, False))
                    else:
                        rows.append((ref, mt, wh[0], wh[1], 0, True))
                elif ext == "bmp":
                    wh = _parse_bmp(b)
                    if wh is None:
                        rows.append((ref, mt, None, None, None, False))
                    else:
                        rows.append((ref, mt, wh[0], wh[1], 0, True))
                elif ext == "wav":
                    dur = _parse_wav(b)
                    if dur is None:
                        rows.append((ref, mt, None, None, None, False))
                    else:
                        rows.append((ref, mt, 0, 0, dur, True))
                elif strict:
                    raise NotImplementedError(
                        f"real media decode for '.{ext}' requires PIL/ffmpeg "
                        "(not in this image); png/gif/wav parse headers natively"
                    )
                else:
                    rows.append((ref, mt, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "media_type", "width", "height",
                         "duration_ms", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, PAYLOAD_DECODED_SCHEMA
    )


def gif_frame_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_ref, payload) → REAL GIF block-stream walk: (width, height,
    n_frames, ok) — image descriptors counted positionally off the
    length-prefixed sub-block structure (no LZW inflate needed), so an
    independent engine can recompute n_frames from the generation rule and
    verify the walk EXACTLY.  Non-gif extensions and malformed streams →
    ok=false rows (error channel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                wh = _parse_gif(b) if ref.lower().endswith(".gif") else None
                nf = _gif_frame_count(b) if wh is not None else None
                if wh is None or nf is None:
                    rows.append((ref, None, None, None, False))
                else:
                    rows.append((ref, wh[0], wh[1], nf, True))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "n_frames", "ok"]
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, GIF_FRAMES_SCHEMA
    )


def _media_type(ref: str) -> str:
    ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
    return {
        "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
        "bmp": "image",
        "mp3": "audio", "wav": "audio", "flac": "audio",
        "mp4": "video", "mkv": "video", "webm": "video",
    }.get(ext, "unknown")


def _fake_decode(ref: str) -> tuple[int, int, int]:
    h = hashlib.md5(ref.encode()).digest()
    return 16 + h[0] * 8, 16 + h[1] * 8, int.from_bytes(h[2:4], "big")


def decode_media(
    media: DataFrame,
    fake: bool = True,
    payload_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """(doc_id, media_ref) → decoded metadata.

    ``fake=False`` with ``payload_col`` set routes to the REAL header
    decode (``decode_media_payloads`` — png/gif/wav parsed natively, other
    extensions ok=false rows, or the declared codec stub under
    ``strict=True``); ``fake=False`` without payload bytes raises: there
    is nothing to decode from a bare ref."""
    if not fake and payload_col is not None:
        return decode_media_payloads(media, payload_col, strict=strict)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs payload bytes: pass payload_col= "
                    "(png/wav parse natively; other formats need PIL/ffmpeg, "
                    "not in this image — use fake=True for the stub)"
                )
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                w, hgt, dur = _fake_decode(ref)
                mt = _media_type(ref)
                rows.append(
                    (doc_id, ref, mt, w, hgt, dur if mt in ("audio", "video") else 0,
                     mt != "unknown")
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "media_type", "width", "height",
                         "duration_ms", "ok"],
            )

    return media.select("doc_id", "media_ref").mapInPandas(run, DECODED_SCHEMA)


PIXELS_SCHEMA = (
    "media_ref string, width int, height int, n_px long, "
    "sum_r long, sum_g long, sum_b long, ok boolean"
)
SAMPLES_SCHEMA = (
    "media_ref string, n_samples long, sum_amp long, sample_rate int, ok boolean"
)
THUMB_SCHEMA = (
    "media_ref string, ty int, sum_r long, sum_g long, sum_b long, ok boolean"
)
AUDIO_FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, n int, sum_amp long, sum_abs long, "
    "n_zc int, ok boolean"
)
GIF_SAMPLE_SCHEMA = (
    "media_ref string, f int, n_px long, sum_r long, sum_g long, "
    "sum_b long, ok boolean"
)


def _png_raster(b: bytes) -> "np.ndarray | None":
    """REAL raster decode for the 8-bit RGB / filter-0 / non-interlaced
    PNG subset, stdlib-only: walk the chunk stream, concatenate IDAT,
    zlib inflate, strip per-row filter bytes → (height, width, 3) uint8
    array in top-down RGB order.  None for anything outside the subset or
    corrupt — the error channel, not an exception.  (Filters 1-4 and
    other color types need a per-row reconstruction pass; this decoder
    covers the subset the corpus writes and FAILS CLOSED on everything
    else.)"""
    import zlib

    wh = _parse_png(b)
    if wh is None:
        return None
    width, height = wh
    # IHDR data: bitdepth=8, colortype=2 (RGB), interlace=0
    if len(b) < 29 or b[24] != 8 or b[25] != 2 or b[28] != 0:
        return None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None  # truncated chunk
        if tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + data + crc
    if not idat:
        return None
    try:
        raster = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = 1 + 3 * width
    if len(raster) != stride * height:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, stride)
    if (arr[:, 0] != 0).any():
        return None  # filter types other than None: outside the subset
    return arr[:, 1:].reshape(height, width, 3)


def _decode_png_pixels(b: bytes) -> tuple[int, int, int, int, int] | None:
    """(width, height, sum_r, sum_g, sum_b) over the real PNG raster —
    exact integer channel sums; None on corrupt/unsupported payloads."""
    px = _png_raster(b)
    if px is None:
        return None
    h, w = px.shape[0], px.shape[1]
    s = px.astype(np.int64).sum(axis=(0, 1))
    return w, h, int(s[0]), int(s[1]), int(s[2])


def _bmp_raster(b: bytes) -> "np.ndarray | None":
    """REAL raster decode for the 24-bit uncompressed BMP subset: read the
    raster straight off the pixel-array offset (no decompression at all),
    drop the per-row 4-byte-alignment padding → (height, width, 3) uint8
    in TOP-DOWN RGB order.  BMP stores rows bottom-up in BGR order, so
    both the row order and the channel order are reversed here — a
    positional consumer (thumbnailing, row stats) sees the image the way
    a viewer renders it.  None outside the subset / corrupt — the error
    channel, not an exception."""
    wh = _parse_bmp(b)
    if wh is None:
        return None
    width, height = wh
    off = int.from_bytes(b[10:14], "little")
    row = (3 * width + 3) & ~3
    if off < 54 or len(b) < off + row * height:
        return None
    arr = np.frombuffer(b, dtype=np.uint8, count=row * height, offset=off)
    px = arr.reshape(height, row)[:, : 3 * width].reshape(height, width, 3)
    return px[::-1, :, ::-1]  # bottom-up BGR → top-down RGB


def _decode_bmp_pixels(b: bytes) -> tuple[int, int, int, int, int] | None:
    """(width, height, sum_r, sum_g, sum_b) over the real BMP raster —
    exact integer channel sums (orientation doesn't affect sums, but the
    BGR→RGB mapping does: a swapped mapping gives wrong per-channel
    integers and fails the oracle hash).  None outside the subset /
    corrupt."""
    px = _bmp_raster(b)
    if px is None:
        return None
    h, w = px.shape[0], px.shape[1]
    s = px.astype(np.int64).sum(axis=(0, 1))
    return w, h, int(s[0]), int(s[1]), int(s[2])


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int] | None:
    """REAL GIF-LZW decompression, stdlib-only: LSB-first variable-width
    codes, CLEAR resets the table, code width grows when the next free
    slot reaches 2^width (capped at 12 bits per the spec), the KwKwK case
    (code == next free slot) resolves to prev + prev[0].  Returns the
    pixel-index list, or None on any malformed stream (truncated bits,
    out-of-range code, data before the first literal)."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    literals: list[list[int] | None] = [[i] for i in range(clear)]
    table = literals + [None, None]
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    nbits = len(data) * 8
    while True:
        if bitpos + width > nbits:
            return None  # ran out of bits before EOI
        byte0 = bitpos >> 3
        chunk = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        )  # width ≤ 12 → spans ≤ 3 bytes
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = literals + [None, None]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                return None
            entry = [code]
        elif code < len(table):
            e = table[code]
            if e is None:
                return None
            entry = e
        elif code == len(table):
            entry = prev + [prev[0]]  # KwKwK
        else:
            return None
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry


def _gif_frames_raw(
    b: bytes,
) -> "tuple[int, int, list[tuple[int, int, np.ndarray, bytes, int]]] | None":
    """STRUCTURAL walk of a palette GIF's block stream WITHOUT touching
    the LZW bits: → (width, height, frames) where each frame is
    (fw, fh, palette, lzw_bytes, min_code_size).  Local color tables
    override the global one per frame.  Separating the (cheap) walk from
    the (expensive) LZW decode is what makes frame SAMPLING sub-linear in
    frame count — a sampler decodes only the frames it keeps.  None on
    structurally corrupt streams — the error channel, not an
    exception."""
    wh = _parse_gif(b)
    if wh is None or len(b) < 13:
        return None
    width, height = wh
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            return None
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames: list[tuple[int, int, np.ndarray, bytes, int]] = []
    while pos < len(b):
        introducer = b[pos]
        if introducer == 0x3B:
            return width, height, frames
        if introducer == 0x21:
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif introducer == 0x2C:
            if pos + 10 > len(b):
                return None
            fw, fh = struct.unpack("<HH", b[pos + 5 : pos + 9])
            lpacked = b[pos + 9]
            pos += 10
            pal = gct
            if lpacked & 0x80:
                n = 2 << (lpacked & 0x07)
                if pos + 3 * n > len(b):
                    return None
                pal = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if pal is None or pos >= len(b):
                return None
            mcs = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(b):
                return None
            pos += 1
            frames.append((fw, fh, pal, bytes(data), mcs))
        else:
            return None
    return None  # ran off the end without a trailer


def _gif_frame_indices(
    frame: "tuple[int, int, np.ndarray, bytes, int]",
) -> "np.ndarray | None":
    """LZW-decode one walked frame → (fh, fw) int index array, validated
    against the frame dims and the active palette size; None on a
    malformed stream."""
    fw, fh, pal, data, mcs = frame
    idx = _gif_lzw_decode(data, mcs)
    if idx is None or len(idx) != fw * fh:
        return None
    a = np.asarray(idx, dtype=np.int64)
    if a.size and int(a.max()) >= pal.shape[0]:
        return None
    return a.reshape(fh, fw)


def _decode_gif_pixels(
    b: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """REAL pixel decode for palette GIFs: walk the block stream, LZW-
    decompress every frame's raster, map indices through the active color
    table → (width, height, n_px_total, sum_r, sum_g, sum_b) summed over
    ALL frames.  Interlace only permutes row order, which channel sums
    don't see.  None on corrupt streams / frame size mismatch — the error
    channel, not an exception."""
    walked = _gif_frames_raw(b)
    if walked is None:
        return None
    width, height, frames = walked
    sums = np.zeros(3, dtype=np.int64)
    n_px = 0
    for frame in frames:
        a = _gif_frame_indices(frame)
        if a is None:
            return None
        pal = frame[2]
        sums += pal[a.ravel()].astype(np.int64).sum(axis=0)
        n_px += a.size
    return width, height, n_px, int(sums[0]), int(sums[1]), int(sums[2])


def image_channel_stats(
    media: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """(media_ref, payload) → REAL per-channel pixel sums for PNG, BMP
    and GIF payloads: (width, height, n_px, sum_r, sum_g, sum_b, ok) —
    integer sums, so an independent engine can verify them EXACTLY (the
    driver oracle recomputes them from the corpus' deterministic color
    rule without inflating anything).  PNG inflates the IDAT; BMP reads
    the uncompressed raster straight off the pixel-array offset; GIF
    runs a real LZW decompression over every frame and maps indices
    through the color table (n_px summed across frames).  Other
    extensions → ok=false rows (error channel; a stray .jpg must not kill
    the job) unless ``strict=True``, which raises the declared codec
    stub.  Corrupt/unsupported payloads → ok=false row."""
    decoders = {
        "png": _decode_png_pixels,
        "bmp": _decode_bmp_pixels,
        "gif": _decode_gif_pixels,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                dec = decoders.get(ext)
                if dec is None:
                    if strict:
                        raise NotImplementedError(
                            f"pixel decode for '.{ext}' requires a codec "
                            "library (not in this image); png/bmp decode "
                            "natively"
                        )
                    rows.append((ref, None, None, None, None, None, None, False))
                    continue
                out = dec(bytes(payload) if payload is not None else b"")
                if out is None:
                    rows.append((ref, None, None, None, None, None, None, False))
                elif len(out) == 5:  # single-frame formats: n_px = w*h
                    w, h, sr, sg, sb = out
                    rows.append((ref, w, h, w * h, sr, sg, sb, True))
                else:  # gif: n_px summed over frames
                    w, h, npx, sr, sg, sb = out
                    rows.append((ref, w, h, npx, sr, sg, sb, True))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height", "n_px",
                         "sum_r", "sum_g", "sum_b", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(run, PIXELS_SCHEMA)


def audio_sample_stats(
    media: DataFrame, payload_col: str = "payload", strict: bool = False
) -> DataFrame:
    """(media_ref, payload) → REAL PCM sample statistics for WAV payloads:
    (n_samples, sum_amp, sample_rate, ok) — 16-bit LE samples read off the
    data chunk with numpy, summed exactly.  A wrong offset, stride, or
    endianness gives a wrong integer sum, so the oracle cross-check
    verifies the byte-level parse, not just the header.  Non-wav
    extensions → ok=false rows unless ``strict=True`` (declared codec
    stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                if ext != "wav":
                    if strict:
                        raise NotImplementedError(
                            f"sample decode for '.{ext}' requires a codec "
                            "library (not in this image); wav decodes natively"
                        )
                    rows.append((ref, None, None, None, False))
                    continue
                b = bytes(payload) if payload is not None else b""
                if _parse_wav(b) is None:
                    rows.append((ref, None, None, None, False))
                    continue
                bits = struct.unpack("<H", b[34:36])[0]
                data_size = struct.unpack("<I", b[40:44])[0]
                rate = struct.unpack("<I", b[24:28])[0]
                body = b[44 : 44 + data_size]
                if bits != 16 or len(body) != data_size or data_size % 2:
                    rows.append((ref, None, None, None, False))
                    continue
                samples = np.frombuffer(body, dtype="<i2")
                rows.append(
                    (ref, len(samples), int(samples.astype(np.int64).sum()),
                     rate, True)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "n_samples", "sum_amp", "sample_rate", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(run, SAMPLES_SCHEMA)


def _full_raster(ext: str, b: bytes) -> "np.ndarray | None":
    """Decode a png/bmp payload — or a gif's FIRST frame, full-canvas
    only — to an (h, w, 3) uint8 raster via the native decoders.  Shared
    by the resize and perceptual-hash stages; None on any corruption."""
    if ext == "png":
        return _png_raster(b)
    if ext == "bmp":
        return _bmp_raster(b)
    if ext == "gif":
        walked = _gif_frames_raw(b)
        if walked is None or not walked[2]:
            return None
        width, height, frames = walked
        fw, fh, pal = frames[0][0], frames[0][1], frames[0][2]
        if (fw, fh) != (width, height):
            return None  # partial first frame: outside the subset
        a = _gif_frame_indices(frames[0])
        if a is None:
            return None
        return pal[a]
    return None


def thumbnail_row_stats(
    media: DataFrame,
    th: int = 8,
    tw: int = 8,
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """REAL image RESIZE over the decoded rasters — the thumbnail stage
    of a multimodal training-data pipeline, as an Arrow-batched
    mapInPandas pass (one partition-local decode per payload; scales as
    a narrow map, no shuffle).

    Nearest-neighbor downsample (or upsample) of every PNG / BMP /
    GIF-frame-0 raster to ``th × tw``: thumbnail pixel (ty, tx) = source
    pixel ((ty·h) div th, (tx·w) div tw).  Output is one row per
    THUMBNAIL ROW: (media_ref, ty, sum_r, sum_g, sum_b, ok) — exact
    integer channel sums across the row, so an independent engine can
    recompute every value from the corpus color rule + header dims and a
    wrong row mapping, column mapping, BMP orientation flip, or palette
    lookup fails the hash.  Corrupt / unsupported payloads → a single
    (ty=-1, -1 sums, ok=false) row unless ``strict=True`` (declared
    codec stub for formats needing external libraries)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = (None, None, None, None, False)
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                if ext not in ("png", "bmp", "gif"):
                    if strict:
                        raise NotImplementedError(
                            f"raster decode for '.{ext}' requires a codec "
                            "library (not in this image); png/bmp/gif "
                            "decode natively"
                        )
                    rows.append((ref, *bad))
                    continue
                px = _full_raster(
                    ext, bytes(payload) if payload is not None else b""
                )
                if px is None:
                    rows.append((ref, *bad))
                    continue
                h, w = px.shape[0], px.shape[1]
                ys = (np.arange(th, dtype=np.int64) * h) // th
                xs = (np.arange(tw, dtype=np.int64) * w) // tw
                thumb = px[np.ix_(ys, xs)].astype(np.int64)
                rs = thumb.sum(axis=1)  # (th, 3) row channel sums
                rows.extend(
                    (ref, ty, int(rs[ty, 0]), int(rs[ty, 1]), int(rs[ty, 2]),
                     True)
                    for ty in range(th)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "ty", "sum_r", "sum_g", "sum_b", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(run, THUMB_SCHEMA)


AHASH_SCHEMA = (
    "media_ref string, b0 int, b1 int, b2 int, b3 int, ok boolean"
)


def image_ahash(
    media: DataFrame,
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Perceptual AVERAGE HASH (aHash) of every decodable image — the
    classic image near-dup fingerprint (8×8 NN thumbnail → integer ITU-R
    BT.601 luma → mean threshold → 64 bits), computed over the REAL
    decoded rasters as a narrow Arrow mapInPandas pass.

    Exact integer pipeline, so an independent engine can recompute every
    bit closed-form: luma(ty, tx) = (299·r + 587·g + 114·b) div 1000 of
    the NN-sampled pixel; bit = 1 iff 64·luma > Σ luma (strict, so an
    all-equal raster hashes to 0).  The 64 bits are emitted as FOUR
    16-bit band integers b0..b3 (b_i covers thumb rows 2i and 2i+1,
    MSB-first in row-major order) — the band decomposition is exactly
    what a banded LSH self-join needs downstream, and 16-bit values stay
    positive in every SQL engine so XOR/bit_count arithmetic is portable.
    Corrupt / unsupported payloads → (ok=false, -1 bands) sentinels
    unless ``strict=True``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = (-1, -1, -1, -1, False)
        weights = np.array([299, 587, 114], dtype=np.int64)
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                if ext not in ("png", "bmp", "gif"):
                    if strict:
                        raise NotImplementedError(
                            f"raster decode for '.{ext}' requires a codec "
                            "library (not in this image); png/bmp/gif "
                            "decode natively"
                        )
                    rows.append((ref, *bad))
                    continue
                px = _full_raster(
                    ext, bytes(payload) if payload is not None else b""
                )
                if px is None:
                    rows.append((ref, *bad))
                    continue
                h, w = px.shape[0], px.shape[1]
                ys = (np.arange(8, dtype=np.int64) * h) // 8
                xs = (np.arange(8, dtype=np.int64) * w) // 8
                thumb = px[np.ix_(ys, xs)].astype(np.int64)
                luma = (thumb @ weights) // 1000  # (8, 8)
                bits = (64 * luma > luma.sum()).astype(np.int64).ravel()
                shifts = 15 - (np.arange(64) % 16)
                vals = bits << shifts
                bands = [int(vals[16 * i : 16 * (i + 1)].sum())
                         for i in range(4)]
                rows.append((ref, *bands, True))
            yield pd.DataFrame(
                rows, columns=["media_ref", "b0", "b1", "b2", "b3", "ok"]
            )

    return media.select("media_ref", payload_col).mapInPandas(run, AHASH_SCHEMA)


def audio_frame_features(
    media: DataFrame,
    frame: int = 256,
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """REAL audio FEATURE EXTRACTION over the decoded PCM — the framing
    stage a speech pipeline runs before any model: split each WAV's
    16-bit samples into consecutive ``frame``-sample windows (last one
    ragged) and emit the classic integer frame features

        (media_ref, frame_idx, n, sum_amp, sum_abs, n_zc, ok)

    where ``sum_abs`` is the L1 energy and ``n_zc`` counts strict sign
    flips between CONSECUTIVE samples WITHIN the frame (pairs straddling
    a frame boundary belong to neither frame — the split a wrong
    boundary shifts, which the oracle hash then catches).  All values are
    exact integers recomputable from the corpus sample rule.  Corrupt /
    non-wav payloads → a single (frame_idx=-1, -1s, ok=false) row unless
    ``strict=True``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = (None, None, None, None, None, False)
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                if ext != "wav":
                    if strict:
                        raise NotImplementedError(
                            f"sample decode for '.{ext}' requires a codec "
                            "library (not in this image); wav decodes "
                            "natively"
                        )
                    rows.append((ref, *bad))
                    continue
                b = bytes(payload) if payload is not None else b""
                if _parse_wav(b) is None or len(b) < 44:
                    rows.append((ref, *bad))
                    continue
                bits = struct.unpack("<H", b[34:36])[0]
                data_size = struct.unpack("<I", b[40:44])[0]
                body = b[44 : 44 + data_size]
                if bits != 16 or len(body) != data_size or data_size % 2:
                    rows.append((ref, *bad))
                    continue
                s = np.frombuffer(body, dtype="<i2").astype(np.int64)
                for f in range(0, (len(s) + frame - 1) // frame):
                    seg = s[f * frame : (f + 1) * frame]
                    zc = int(np.count_nonzero(seg[:-1] * seg[1:] < 0))
                    rows.append(
                        (ref, f, len(seg), int(seg.sum()),
                         int(np.abs(seg).sum()), zc, True)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "frame_idx", "n", "sum_amp",
                         "sum_abs", "n_zc", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, AUDIO_FRAMES_SCHEMA
    )


def gif_frame_samples(
    media: DataFrame,
    stride: int = 3,
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """REAL video-style FRAME SAMPLING: keep every ``stride``-th frame of
    each animated GIF and emit exact per-SAMPLED-frame channel sums
    (media_ref, f, n_px, sum_r, sum_g, sum_b, ok).

    The structural block walk (:func:`_gif_frames_raw`) is separated from
    the LZW decode, so skipped frames are never decompressed — the cost
    is O(kept frames), the property that makes frame sampling worth
    running at catalog scale (a real video pipeline samples exactly this
    way: demux all, decode few).  Any sampled frame failing to decode
    fails the whole payload closed (single ok=false row), matching the
    all-frames decoder's contract; non-gif extensions → ok=false row
    unless ``strict=True``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = (None, None, None, None, None, False)
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf[payload_col]):
                ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
                if ext != "gif":
                    if strict:
                        raise NotImplementedError(
                            f"frame decode for '.{ext}' requires a codec "
                            "library (not in this image); gif decodes "
                            "natively"
                        )
                    rows.append((ref, *bad))
                    continue
                walked = _gif_frames_raw(
                    bytes(payload) if payload is not None else b""
                )
                if walked is None:
                    rows.append((ref, *bad))
                    continue
                _, _, frames = walked
                out = []
                for f in range(0, len(frames), stride):
                    a = _gif_frame_indices(frames[f])
                    if a is None:
                        out = None
                        break
                    pal = frames[f][2]
                    ssum = pal[a.ravel()].astype(np.int64).sum(axis=0)
                    out.append(
                        (ref, f, a.size, int(ssum[0]), int(ssum[1]),
                         int(ssum[2]), True)
                    )
                if out is None:
                    rows.append((ref, *bad))
                else:
                    rows.extend(out)
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "f", "n_px", "sum_r", "sum_g",
                         "sum_b", "ok"],
            )

    return media.select("media_ref", payload_col).mapInPandas(
        run, GIF_SAMPLE_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor — the Arrow batch shape of a
    real embedding model stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (np.frombuffer(
                    (hashlib.md5(ref.encode()).digest() * (dim // 16 + 1))[:dim],
                    dtype=np.uint8,
                ).astype(np.float32) / 255.0).tolist()
                for ref in pdf["media_ref"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                 "features": feats}
            )

    return media.select("doc_id", "media_ref").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video refs (deterministic offsets from the
    fake duration)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                if _media_type(ref) != "video":
                    continue
                _, _, dur = _fake_decode(ref)
                rows.append((doc_id, ref, list(range(0, dur, every_ms))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_ms"])

    return media.select("doc_id", "media_ref").mapInPandas(run, FRAMES_SCHEMA)


def modality_stats(documents: DataFrame) -> DataFrame:
    """Per-document modality profile straight off the interleaved span
    array — one narrow JVM projection, no explode and no Python:

    (doc_id, n_spans, n_media, n_image, n_audio, n_video, text_bytes,
     media_frac)

    ``n_image``/``n_audio``/``n_video`` classify ``media_ref`` by extension
    (the same table as ``_media_type``); ``text_bytes`` sums the text
    payload of every span; ``media_frac`` = media spans / all spans
    (rounded to 4 — exact in any engine).  The curation signal for a
    text+media corpus: filter docs that are all boilerplate media, or route
    media-heavy docs to the decode pipeline."""
    from pyspark.sql import functions as F

    media = "filter(spans, s -> s.media_ref IS NOT NULL)"

    def n_ext(exts: tuple[str, ...]) -> str:
        conds = " OR ".join(
            f"endswith(lower(s.media_ref), '.{e}')" for e in exts
        )
        return f"size(filter(spans, s -> s.media_ref IS NOT NULL AND ({conds})))"

    return documents.select(
        "doc_id",
        F.expr("size(spans)").cast("long").alias("n_spans"),
        F.expr(f"size({media})").cast("long").alias("n_media"),
        F.expr(n_ext(("png", "jpg", "jpeg", "gif"))).cast("long").alias("n_image"),
        F.expr(n_ext(("mp3", "wav", "flac"))).cast("long").alias("n_audio"),
        F.expr(n_ext(("mp4", "mkv", "webm"))).cast("long").alias("n_video"),
        F.expr(
            "aggregate(spans, 0L, (acc, s) -> acc + octet_length(coalesce(s.text, '')))"
        ).alias("text_bytes"),
        F.expr(
            # guard: ANSI division by zero on a spanless doc
            f"CASE WHEN size(spans) = 0 THEN 0.0 "
            f"ELSE round(size({media}) / size(spans), 4) END"
        ).alias("media_frac"),
    )
