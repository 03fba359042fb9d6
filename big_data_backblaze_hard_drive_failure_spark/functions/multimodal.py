"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.14): image/audio/video travel as ``binary``
columns with typed metadata alongside; decode / feature-extract runs
as Arrow-batched ``mapInPandas`` so each Python worker processes a
whole columnar batch (the only sane way to touch Python from a
100 TB scan). Partitioning guidance: binary payloads dominate row
size — keep ``spark.sql.files.maxPartitionBytes`` at the default
128 MB so scan tasks stay memory-bounded, and NEVER collect payloads.

Decoders: heavyweight codecs (libjpeg/ffmpeg via PIL etc.) are NOT in
this container, so ``decode_image`` handles the two classic
header-parseable containers — 24-bit uncompressed BMP and binary PPM
(P6) — with a pure-Python parser. That makes the mapInPandas decode
path END-TO-END real (real container bytes in, parsed dimensions and
pixel stats out); ``fake_decode_meta`` remains as the codec-free
deterministic twin exercising the identical Arrow plumbing.
"""

from __future__ import annotations

import struct

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the decoded-metadata record batch
DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("fake_n_frames", T.IntegerType()),
    ]
)


def binary_payload(text: Column | str) -> Column:
    """Opaque binary column (fixture stand-in: utf-8 bytes of text;
    in production this is the raw image/audio blob)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.encode(c, "utf-8")


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit uncompressed (BI_RGB) BMP writer. ``rgb`` is
    top-down row-major R,G,B triples (len == width*height*3); BMP
    stores rows bottom-up as B,G,R padded to 4-byte boundaries —
    the layout inversion is exactly what makes the round-trip a real
    decoder test rather than a byte echo."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb len {len(rgb)} != {width}x{height}x3")
    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        rows.append(bytes(row) + pad)
    pixels = b"".join(rows)
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-Python image decode for the two header-parseable classic
    containers; returns ``(width, height, rgb)`` with ``rgb`` as
    top-down row-major R,G,B triples.

    * BMP: 24-bit uncompressed BI_RGB, BITMAPINFOHEADER(+), bottom-up
      or top-down (negative height), 4-byte row padding.
    * PPM: binary ``P6``, maxval <= 255.

    Compressed formats (JPEG/PNG) need codec libraries absent from
    this container and raise ``NotImplementedError``.
    """
    if payload[:2] == b"BM":
        offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"only 24-bit BI_RGB BMP (got bpp={bpp})")
        top_down = height < 0
        height = abs(height)
        row_size = (width * 3 + 3) & ~3
        # validate claimed dims against the actual payload BEFORE
        # allocating: a bit-flipped header claiming 2^31 x 2^31 must
        # raise, not near-OOM the worker on a bogus allocation
        if width <= 0 or height <= 0:
            raise ValueError(f"bad BMP dimensions {width}x{height}")
        if offset + row_size * height > len(payload):
            raise ValueError("truncated BMP pixel data")
        rgb = bytearray(width * height * 3)
        for row in range(height):
            y = row if top_down else height - 1 - row
            base = offset + row * row_size
            for x in range(width):
                b, g, r = payload[base + x * 3: base + x * 3 + 3]
                j = (y * width + x) * 3
                rgb[j], rgb[j + 1], rgb[j + 2] = r, g, b
        return width, height, bytes(rgb)
    if payload[:2] == b"P6":
        width, height, rgb, _ = _parse_ppm(payload, 0)
        return width, height, rgb
    raise NotImplementedError(
        "unsupported image container (JPEG/PNG need codec libs absent "
        "from this environment); supported: 24-bit BMP, binary PPM"
    )


def _parse_ppm(payload: bytes, start: int) -> tuple[int, int, bytes, int]:
    """Parse one binary-PPM (P6) image at ``start``; returns
    (width, height, rgb, end_offset) with ``end_offset`` one past the
    pixel data — the single header scanner shared by the still-image
    and frame-stream decoders, bounds-checked throughout."""
    if payload[start: start + 2] != b"P6":
        raise ValueError(f"bad PPM magic at offset {start}")
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws>
    fields: list[int] = []
    i = start + 2
    while len(fields) < 3:
        while i < len(payload) and payload[i: i + 1].isspace():
            i += 1
        if payload[i: i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j: j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    end = i + width * height * 3
    rgb = payload[i:end]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb, end


# Schema of the REAL-decode record batch (decode_image over BMP/PPM)
DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_byte_sum", T.LongType()),
        T.StructField("top_left_r", T.IntegerType()),
        T.StructField("bottom_right_b", T.IntegerType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synth_image_payload(doc_id: int) -> bytes:
    """Deterministic tiny image for doc_id: dims ``(4+id%8, 3+id%5)``,
    logical top-down RGB byte i = ``(id*31+i) % 256``. Every third doc
    is packed as binary PPM, the rest as 24-bit BMP — both decoder
    branches see traffic. The closed-form byte rule is what lets the
    DuckDB oracle recompute the decoded stats without any codec."""
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    rgb = bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))
    if doc_id % 3 == 0:
        return b"P6\n%d %d\n255\n" % (w, h) + rgb
    return encode_bmp(w, h, rgb)


def _synth_payloads(df: DataFrame, payload_fn) -> DataFrame:
    """doc_id frame -> (doc_id, payload) with real container bytes in
    a binary column, Arrow-batched (the production shape: blobs live
    in a binary column next to their key, never driver-side)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": ids.map(payload_fn)}
            )

    return df.mapInPandas(_gen, PAYLOAD_SCHEMA)


def synth_image_payloads(df: DataFrame) -> DataFrame:
    return _synth_payloads(df, synth_image_payload)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """REAL decode path: (doc_id, payload) -> parsed dimensions and
    pixel stats via decode_image, Arrow-batched mapInPandas. The
    corner stats (top-left R, bottom-right B) pin row order and
    bottom-up/padding reconstruction, not just byte totals."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels",
                "pixel_byte_sum", "top_left_r", "bottom_right_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["pixel_byte_sum"].append(sum(rgb))
                out["top_left_r"].append(rgb[0] if rgb else -1)
                out["bottom_right_b"].append(rgb[-1] if rgb else -1)
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, DECODED_IMAGE_SCHEMA)


def resize_nearest(
    width: int, height: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resize of top-down row-major RGB triples:
    output pixel (x, y) samples source (x*width//out_w,
    y*height//out_h) — the standard floor mapping, closed-form
    recomputable by the oracle."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = y * height // out_h
        for x in range(out_w):
            sx = x * width // out_w
            si = (sy * width + sx) * 3
            di = (y * out_w + x) * 3
            out[di: di + 3] = rgb[si: si + 3]
    return bytes(out)


RESIZED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rs_byte_sum", T.LongType()),
        T.StructField("rs_top_left_r", T.IntegerType()),
        T.StructField("rs_bottom_right_b", T.IntegerType()),
    ]
)


def decode_resize_meta(df: DataFrame, out_w: int = 2, out_h: int = 2) -> DataFrame:
    """Decode real container bytes, nearest-neighbor resize, emit
    resized-pixel stats — the decode+preprocess stage of an image
    training pipeline as one Arrow map stage."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "rs_byte_sum", "rs_top_left_r", "rs_bottom_right_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                rs = resize_nearest(w, h, rgb, out_w, out_h)
                out["doc_id"].append(int(doc_id))
                out["rs_byte_sum"].append(sum(rs))
                out["rs_top_left_r"].append(rs[0])
                out["rs_bottom_right_b"].append(rs[-1])
            yield pd.DataFrame(out)

    return df.mapInPandas(_go, RESIZED_META_SCHEMA)


TOLERANT_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_byte_sum", T.LongType()),
    ]
)


def _try_decode_image(payload) -> tuple[bool, "int | None", "int | None", "bytes | None"]:
    """Failure-normalizing decode shared by the tolerant paths:
    returns ``(ok, width, height, rgb)`` and NEVER raises on
    malformed input — null payloads (``bytes(None)`` is TypeError)
    and every parse failure decode_image classifies (truncation,
    bogus dims, unsupported container) all map to ``ok=False``."""
    if payload is None:
        return False, None, None, None
    try:
        w, h, rgb = decode_image(bytes(payload))
        return True, w, h, rgb
    except (ValueError, NotImplementedError, struct.error, TypeError):
        return False, None, None, None


def decode_image_meta_tolerant(df: DataFrame) -> DataFrame:
    """Error-tolerant decode: at corpus scale some blobs are ALWAYS
    corrupt (including null payloads), and one bad row must not kill
    a 10k-row Arrow batch (let alone the stage). Decode failures are
    flagged per row (``ok = false``, stats null) so downstream can
    filter or audit the corrupt subset — the production posture for a
    100 TB decode pass, vs decode_image_meta which propagates
    (fail-fast for pipelines that treat corruption as a data bug)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "ok", "width", "height", "pixel_byte_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ok, w, h, rgb = _try_decode_image(payload)
                out["doc_id"].append(int(doc_id))
                out["ok"].append(ok)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_byte_sum"].append(sum(rgb) if ok else None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "ok": pd.Series(out["ok"], dtype="bool"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "pixel_byte_sum": pd.Series(
                        out["pixel_byte_sum"], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(_decode, TOLERANT_DECODE_SCHEMA)


# --------------------------------------------------------------------
# Audio: WAV (RIFF little-endian, PCM16 mono) — the classic
# header-parseable audio container, same pure-Python treatment as BMP.
# --------------------------------------------------------------------
DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("amp_max", T.IntegerType()),
        T.StructField("first_sample", T.IntegerType()),
        T.StructField("last_sample", T.IntegerType()),
    ]
)


def encode_wav(sample_rate: int, samples: "list[int]") -> bytes:
    """Minimal RIFF/WAVE writer: PCM16 mono, little-endian. Samples
    are signed 16-bit ints."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> tuple[int, "list[int]"]:
    """Pure-Python WAV decode: RIFF chunk walk -> (sample_rate,
    samples) for PCM16 mono. Compressed audio (MP3/AAC/FLAC) needs
    codec libraries absent from this container and raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio container (MP3/AAC need codec libs); "
            "supported: RIFF/WAVE PCM16 mono"
        )
    i, sample_rate, samples = 12, None, None
    while i + 8 <= len(payload):
        chunk, size = payload[i: i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8: i + 8 + size]
        if chunk == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 mono WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif chunk == b"data":
            samples = [
                struct.unpack_from("<h", body, j)[0] for j in range(0, size, 2)
            ]
        i += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, samples


def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic tiny WAV for doc_id: 8000+1000*(id%3) Hz,
    20+id%13 samples, sample i = ((id*37 + i*11) % 4001) - 2000.
    Closed-form so the DuckDB oracle recomputes decoded stats."""
    n = 20 + doc_id % 13
    rate = 8000 + 1000 * (doc_id % 3)
    return encode_wav(rate, [((doc_id * 37 + i * 11) % 4001) - 2000 for i in range(n)])


def synth_audio_payloads(df: DataFrame) -> DataFrame:
    """doc_id frame -> (doc_id, payload) with real WAV bytes."""
    return _synth_payloads(df, synth_audio_payload)


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """REAL audio decode path: (doc_id, payload) -> parsed rate and
    amplitude stats via decode_audio, Arrow-batched mapInPandas."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "amp_sum",
                "amp_max", "first_sample", "last_sample",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_audio(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["amp_sum"].append(sum(abs(s) for s in samples))
                out["amp_max"].append(max(abs(s) for s in samples))
                out["first_sample"].append(samples[0])
                out["last_sample"].append(samples[-1])
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, DECODED_AUDIO_SCHEMA)


# --------------------------------------------------------------------
# Video: concatenated binary-PPM frame stream (what
# ``ffmpeg -f image2pipe -vcodec ppm`` emits) — real multi-frame
# parsing without a container library.
# --------------------------------------------------------------------
DECODED_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sampled_frame_ids", T.ArrayType(T.IntegerType())),
        T.StructField("sampled_byte_sum", T.LongType()),
    ]
)


def decode_video_frames(payload: bytes) -> "list[tuple[int, int, bytes]]":
    """Parse a concatenated-PPM frame stream into a list of decoded
    frames. Each frame is a complete P6 image; frames follow each
    other back-to-back (the image2pipe convention)."""
    frames = []
    i = 0
    while i < len(payload):
        w, h, rgb, i = _parse_ppm(payload, i)
        frames.append((w, h, rgb))
    return frames


def synth_video_payload(doc_id: int) -> bytes:
    """Deterministic frame stream for doc_id: 2+id%6 frames of
    (3+id%4) x 2 pixels; frame f's logical byte i =
    (id*13 + f*7 + i) % 256. Closed-form for the oracle."""
    n_frames = 2 + doc_id % 6
    w, h = 3 + doc_id % 4, 2
    out = []
    for f in range(n_frames):
        rgb = bytes((doc_id * 13 + f * 7 + i) % 256 for i in range(w * h * 3))
        out.append(b"P6\n%d %d\n255\n" % (w, h) + rgb)
    return b"".join(out)


def synth_video_payloads(df: DataFrame) -> DataFrame:
    """doc_id frame -> (doc_id, payload) with real frame-stream bytes."""
    return _synth_payloads(df, synth_video_payload)


def decode_video_meta(df: DataFrame, k_frames: int = 2) -> DataFrame:
    """REAL video path: parse the frame stream, sample k evenly-spaced
    frames (index rule ``f_j = j * (n-1) // (k-1)``, the same rule the
    index-only twin datapipe_frame_sample uses), decode those frames
    and emit their pixel stats."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_frames", "width", "height",
                "sampled_frame_ids", "sampled_byte_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video_frames(bytes(payload))
                n = len(frames)
                if k_frames == 1 or n == 1:
                    picks = [0]
                else:
                    picks = sorted(
                        {j * (n - 1) // (k_frames - 1) for j in range(k_frames)}
                    )
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(n)
                out["width"].append(frames[0][0])
                out["height"].append(frames[0][1])
                out["sampled_frame_ids"].append(picks)
                out["sampled_byte_sum"].append(
                    sum(sum(frames[p][2]) for p in picks)
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_decode, DECODED_VIDEO_SCHEMA)


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """Deterministic 'decode': byte length, first byte, fake dims
    derived from the payload — exercises the exact mapInPandas shape a
    real decoder uses (binary in, typed struct out, Arrow batches)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            # NULL payload (missing asset) -> NULL metadata, row kept —
            # nullable extension dtypes carry the NA through Arrow
            byte_len = payload.map(len, na_action="ignore").astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": byte_len,
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1, na_action="ignore"
                    ).astype("Int32"),
                    "fake_width": (64 + byte_len % 512).astype("Int32"),
                    "fake_height": (64 + byte_len % 384).astype("Int32"),
                    "fake_n_frames": (1 + byte_len % 7).astype("Int32"),
                }
            )

    return df.mapInPandas(_decode, DECODED_META_SCHEMA)


# --------------------------------------------------------------------
# PNG: the one compressed image container we CAN do end-to-end with
# the standard library — its DEFLATE stream is stdlib zlib, and the
# container is length-prefixed CRC-checked chunks. Encoder writes
# 8-bit RGB non-interlaced (filter 0 rows); the decoder is
# spec-complete for that class: all five scanline filters (None, Sub,
# Up, Average, Paeth) and CRC verification, so it reads minimal RGB
# PNGs from other writers too, not only its own output.
# --------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal PNG writer: 8-bit/channel RGB (color type 2), one IDAT,
    filter byte 0 per scanline, zlib level 6. ``rgb`` is top-down
    row-major R,G,B triples."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb len {len(rgb)} != {width}x{height}x3")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride: (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decode for 8-bit RGB (color type 2),
    non-interlaced: chunk walk with CRC verification, zlib-inflate the
    IDAT stream, reverse any of the five scanline filters. Returns
    ``(width, height, rgb)`` top-down row-major. Palette/alpha/16-bit/
    interlaced PNGs raise NotImplementedError."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    i, width = 8, None
    idat = bytearray()
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4: i + 8]
        data = payload[i + 8: i + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_id, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG supported "
                    f"(depth={depth}, color={ctype_id}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1: (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(3, stride):
                line[x] = (line[x] + line[x - 3]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - 3] if x >= 3 else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - 3] if x >= 3 else 0
                ul = prev[x - 3] if x >= 3 else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride: (y + 1) * stride] = line
        prev = line
    return width, height, bytes(out)


def transcode_png_meta(df: DataFrame) -> DataFrame:
    """Transcode pass: decode the BMP/PPM payload, re-encode as PNG,
    decode the PNG back, emit stats of the ROUND-TRIPPED pixels. A
    layout or filter bug in either PNG direction (or the original
    decode) shifts the stats; losslessness is what makes the output
    closed-form recomputable by the oracle. One Arrow map stage —
    the shape of a 100 TB format-normalization pass."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels",
                "pixel_byte_sum", "top_left_r", "bottom_right_b",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                w2, h2, rgb2 = decode_png(encode_png(w, h, rgb))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w2)
                out["height"].append(h2)
                out["n_pixels"].append(w2 * h2)
                out["pixel_byte_sum"].append(sum(rgb2))
                out["top_left_r"].append(rgb2[0] if rgb2 else -1)
                out["bottom_right_b"].append(rgb2[-1] if rgb2 else -1)
            yield pd.DataFrame(out)

    return df.mapInPandas(_go, DECODED_IMAGE_SCHEMA)


# -- Perceptual average-hash (aHash) ---------------------------------

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def average_hash(width: int, height: int, rgb: bytes, grid: int = 4) -> int:
    """Classic perceptual average-hash over decoded RGB bytes:
    nearest-neighbor sample a ``grid x grid`` luminance lattice
    (floor mapping, same convention as resize_nearest), then set bit
    ``j*grid+i`` when the cell's channel sum strictly exceeds the
    lattice mean. All-integer (the mean compare is cross-multiplied:
    ``cell*grid^2 > total``), so the hash is bit-exact reproducible in
    any engine — the DuckDB oracle recomputes it closed-form."""
    cells = []
    for j in range(grid):
        y = (j * height) // grid
        for i in range(grid):
            x = (i * width) // grid
            base = (y * width + x) * 3
            cells.append(rgb[base] + rgb[base + 1] + rgb[base + 2])
    total = sum(cells)
    n = grid * grid
    out = 0
    for k, gs in enumerate(cells):
        if gs * n > total:
            out |= 1 << k
    return out


def image_ahash_meta(df: DataFrame, grid: int = 4) -> DataFrame:
    """(doc_id, payload) -> (doc_id, phash): real container decode
    then average_hash, one Arrow-batched map stage (decode and hash
    fused — pixels never leave the Python worker)."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                ids.append(int(doc_id))
                hashes.append(average_hash(w, h, rgb, grid))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.mapInPandas(_go, AHASH_SCHEMA)
