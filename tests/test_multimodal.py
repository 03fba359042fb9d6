"""Pure-Python image codec (functions/multimodal.py): the decode path
must parse real container bytes — header fields, bottom-up row order,
4-byte BMP row padding, PPM comments — not echo the generator."""

from __future__ import annotations

import struct

import pytest

from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
    decode_image,
    encode_bmp,
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


def test_synth_payload_mixes_containers_and_obeys_byte_rule():
    for doc_id in range(7):
        payload = synth_image_payload(doc_id)
        magic = b"P6" if doc_id % 3 == 0 else b"BM"
        assert payload[:2] == magic, doc_id
        w, h, rgb = decode_image(payload)
        assert (w, h) == (4 + doc_id % 8, 3 + doc_id % 5)
        assert list(rgb) == [(doc_id * 31 + i) % 256 for i in range(w * h * 3)]
