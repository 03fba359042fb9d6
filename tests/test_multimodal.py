"""Pure-Python image codec (functions/multimodal.py): the decode path
must parse real container bytes — header fields, bottom-up row order,
4-byte BMP row padding, PPM comments — not echo the generator."""

from __future__ import annotations

import struct

import pytest

from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
    decode_audio,
    decode_image,
    encode_bmp,
    encode_wav,
    resize_nearest,
    synth_audio_payload,
    synth_image_payload,
)


def test_bmp_roundtrip_odd_width_padding():
    # width 3 -> row stride 12 with 3 pad bytes; any stride mistake
    # shears the reconstructed rows
    w, h = 3, 2
    rgb = bytes(range(w * h * 3))
    out_w, out_h, out = decode_image(encode_bmp(w, h, rgb))
    assert (out_w, out_h, out) == (w, h, rgb)


def test_bmp_roundtrip_even_width():
    w, h = 4, 3
    rgb = bytes((7 * i + 3) % 256 for i in range(w * h * 3))
    assert decode_image(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bmp_top_down_negative_height():
    # flip the height sign in an encoded BMP and reverse the row
    # block: decoders must honor top-down layout
    w, h = 2, 2
    rgb = bytes(range(w * h * 3))
    bmp = bytearray(encode_bmp(w, h, rgb))
    offset = struct.unpack_from("<I", bmp, 10)[0]
    struct.pack_into("<i", bmp, 22, -h)
    row = (w * 3 + 3) & ~3
    rows = [bytes(bmp[offset + r * row: offset + (r + 1) * row]) for r in range(h)]
    bmp[offset:] = b"".join(reversed(rows))
    assert decode_image(bytes(bmp)) == (w, h, rgb)


def test_ppm_with_comment():
    rgb = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# a comment line\n2 2\n255\n" + rgb
    assert decode_image(ppm) == (2, 2, rgb)


def test_unsupported_container_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-like")


def test_wav_roundtrip():
    samples = [0, -2000, 1999, 32767, -32768, 5]
    rate, out = decode_audio(encode_wav(11025, samples))
    assert (rate, out) == (11025, samples)


def test_wav_extra_chunk_and_odd_padding():
    # RIFF walkers must skip unknown chunks and honor 2-byte alignment
    wav = bytearray(encode_wav(8000, [1, 2, 3]))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # odd size + pad
    insert_at = 12  # right after RIFF....WAVE
    wav[insert_at:insert_at] = extra
    struct.pack_into("<I", wav, 4, len(wav) - 8)
    rate, out = decode_audio(bytes(wav))
    assert (rate, out) == (8000, [1, 2, 3])


def test_wav_unsupported_container_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-like-bytes")


def test_synth_audio_payload_obeys_sample_rule():
    for doc_id in (0, 1, 5, 12):
        rate, samples = decode_audio(synth_audio_payload(doc_id))
        assert rate == 8000 + 1000 * (doc_id % 3)
        n = 20 + doc_id % 13
        assert samples == [((doc_id * 37 + i * 11) % 4001) - 2000 for i in range(n)]


def test_resize_nearest_floor_mapping():
    # 4x2 -> 2x2: output (x,y) samples source (x*4//2, y*2//2)=(2x, y)
    w, h = 4, 2
    rgb = bytes(range(w * h * 3))
    rs = resize_nearest(w, h, rgb, 2, 2)
    expect = b"".join(
        rgb[(sy * w + sx) * 3: (sy * w + sx) * 3 + 3]
        for sy, sx in [(0, 0), (0, 2), (1, 0), (1, 2)]
    )
    assert rs == expect


def test_video_frame_stream_roundtrip():
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_video_frames,
        synth_video_payload,
    )

    for doc_id in (0, 3, 5, 11):
        frames = decode_video_frames(synth_video_payload(doc_id))
        assert len(frames) == 2 + doc_id % 6
        w, h = 3 + doc_id % 4, 2
        for f, (fw, fh, rgb) in enumerate(frames):
            assert (fw, fh) == (w, h)
            assert list(rgb) == [
                (doc_id * 13 + f * 7 + i) % 256 for i in range(w * h * 3)
            ]


def test_video_bad_frame_boundary_raises():
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_video_frames,
    )

    good = b"P6\n2 1\n255\n" + bytes(6)
    with pytest.raises(ValueError):
        decode_video_frames(good + b"JUNK")


def test_streaming_decode_matches_batch(spark, sf_smoke, tmp_path):
    """The Arrow decode stage runs unchanged on a stream (Structured
    Streaming's unified model): stream the documents fixture, synth +
    decode, and compare against the batch result."""
    import uuid

    from pyspark.sql import functions as F

    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_image_meta,
        synth_image_payloads,
    )
    from big_data_backblaze_hard_drive_failure_spark.sources.catalog import (
        load,
        schema_for,
    )

    batch = decode_image_meta(
        synth_image_payloads(
            load(spark, sf_smoke, "documents").select("doc_id")
        )
    )
    want = {r["doc_id"]: r["pixel_byte_sum"] for r in batch.collect()}

    stream = (
        spark.readStream.schema(schema_for("documents"))
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_smoke)
        .select("doc_id")
    )
    decoded = decode_image_meta(synth_image_payloads(stream))
    sink = f"mm_{uuid.uuid4().hex[:8]}"
    q = (
        decoded.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["pixel_byte_sum"]
        for r in spark.sql(f"SELECT doc_id, pixel_byte_sum FROM {sink}").collect()
    }
    assert got == want and len(got) > 0


def test_tolerant_decode_flags_corrupt_rows(spark):
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_image_meta_tolerant,
    )

    good = synth_image_payload(1)
    # bit-flipped header claiming absurd dims must be rejected by the
    # payload-size validation, not attempted as a giant allocation
    bogus_dims = bytearray(synth_image_payload(1))
    struct.pack_into("<ii", bogus_dims, 18, 2**31 - 1, 2**31 - 1)
    rows = [
        (1, good),
        (2, good[:10]),
        (3, b"garbage"),
        (4, None),
        (5, bytes(bogus_dims)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: r for r in decode_image_meta_tolerant(df).collect()}
    assert got[1]["ok"] and got[1]["width"] == 5
    assert not got[2]["ok"] and got[2]["width"] is None
    assert not got[3]["ok"] and got[3]["pixel_byte_sum"] is None
    assert not got[4]["ok"]  # null payload flagged, batch survives
    assert not got[5]["ok"]  # bogus dims rejected without allocation


def test_synth_payload_mixes_containers_and_obeys_byte_rule():
    for doc_id in range(7):
        payload = synth_image_payload(doc_id)
        magic = b"P6" if doc_id % 3 == 0 else b"BM"
        assert payload[:2] == magic, doc_id
        w, h, rgb = decode_image(payload)
        assert (w, h) == (4 + doc_id % 8, 3 + doc_id % 5)
        assert list(rgb) == [(doc_id * 31 + i) % 256 for i in range(w * h * 3)]


# ------------------------------------------------------------------
# PNG codec (functions/multimodal.py:encode_png/decode_png)
# ------------------------------------------------------------------
def test_png_roundtrip_lossless():
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    for w, h, seed in ((1, 1, 0), (5, 4, 3), (16, 2, 9)):
        rgb = bytes((seed * 31 + i) % 256 for i in range(w * h * 3))
        assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)


def test_png_decode_inverts_all_five_filters():
    """Hand-build a PNG whose rows use filters 0..4 (forward-filtered
    here, independently of the encoder, which only writes 0) and check
    the decoder reconstructs the original pixels — proves decode_png
    reads spec PNGs from other writers, not just its own output."""
    import struct as _struct
    import zlib

    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        _paeth,
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    w, h = 4, 5
    stride = w * 3
    rgb = bytes((7 * i + 13) % 256 for i in range(w * h * 3))
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = rgb[y * stride: (y + 1) * stride]
        f = y % 5
        raw.append(f)
        for x in range(stride):
            left = line[x - 3] if x >= 3 else 0
            ul = prev[x - 3] if x >= 3 else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - left
            elif f == 2:
                v = line[x] - prev[x]
            elif f == 3:
                v = line[x] - (left + prev[x]) // 2
            else:
                v = line[x] - _paeth(left, prev[x], ul)
            raw.append(v & 0xFF)
        prev = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, rgb)


def test_png_decode_rejects_corruption():
    import pytest as _pytest

    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    png = bytearray(encode_png(3, 3, bytes(27)))
    png[30] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_average_hash_invariants():
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        average_hash,
        decode_image,
        synth_image_payload,
    )

    # flat image -> no cell strictly exceeds the mean -> hash 0
    flat = bytes([7] * (8 * 8 * 3))
    assert average_hash(8, 8, flat) == 0

    # half-bright image: bright half above mean, dark half below
    rgb = bytes([255] * (4 * 8 * 3) + [0] * (4 * 8 * 3))
    h = average_hash(8, 8, rgb)
    assert h == 0x00FF  # top two sample rows set (row-major bits 0..7)

    # hash is a pure function of decoded pixels: decode path == direct
    for doc_id in (0, 1, 5, 12, 40):
        payload = synth_image_payload(doc_id)
        w, ht, rgb = decode_image(payload)
        direct = average_hash(w, ht, rgb)
        assert 0 <= direct < 1 << 16
        assert direct == average_hash(*decode_image(payload))
