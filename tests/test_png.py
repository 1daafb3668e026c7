"""PNG codec: round-trips, all five row filters, color types, autodetect.

The filter test builds a PNG by hand with an independent straight-from-
spec filter implementation (loops, no NumPy tricks), so the decoder's
vectorized/sequential unfilter paths are checked against the RFC 2083
definitions rather than against themselves.
"""

import struct
import zlib

import numpy as np
import pytest

from ocr_gang_spark.atlas import render_page
from ocr_gang_spark.kernels.bmp import decode_media_blob, encode_media_blob
from ocr_gang_spark.kernels.png import _chunk, _MAGIC, decode_png, encode_png


def test_round_trip_random_rgb():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_round_trip_rendered_page_matches_bmp_content():
    page, _ = render_page("Png Codec", key="png-test")
    assert np.array_equal(
        decode_png(encode_png(page)), decode_media_blob(encode_media_blob(page))
    )


def _png_from_scanlines(w, h, color_type, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype, cur, prev, bpp):
    """Straight-from-spec PNG filter (the encoder side), per byte."""
    out = bytearray()
    for i in range(len(cur)):
        x = cur[i]
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = x
        elif ftype == 1:
            v = x - a
        elif ftype == 2:
            v = x - b
        elif ftype == 3:
            v = x - ((a + b) >> 1)
        else:
            v = x - _paeth(a, b, c)
        out.append(v & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("color_type,bpp", [(0, 1), (2, 3), (6, 4)])
def test_all_filters_and_color_types(color_type, bpp):
    rng = np.random.default_rng(color_type)
    h, w = 11, 9
    px = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8)
    scan = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        ftype = y % 5  # exercise every filter, including Paeth after Avg
        cur = bytes(px[y])
        scan.append(ftype)
        scan += _filter_row(ftype, cur, prev, bpp)
        prev = cur
    got = decode_png(_png_from_scanlines(w, h, color_type, bytes(scan)))
    raw = px.reshape(h, w, bpp)
    if color_type == 0:
        expect = np.repeat(raw, 3, axis=2)
    elif color_type == 6:
        expect = raw[:, :, :3]
    else:
        expect = raw
    assert np.array_equal(got, expect)


def test_media_blob_autodetects_png():
    page, _ = render_page("Auto", key="auto")
    assert np.array_equal(decode_media_blob(encode_png(page)), page)


def test_truncated_jpeg_is_a_clear_error():
    # the JPEG magic now dispatches to kernels/jpeg.py; garbage after
    # the magic must still fail loudly, never mis-decode
    with pytest.raises(ValueError):
        decode_media_blob(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_garbage_png_rejected():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        decode_png(b"hello")


def test_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
    data = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(data)


def test_synth_blob_mix_contains_all_formats():
    from ocr_gang_spark.synth import blob_for_ref

    fmts = set()
    for i in range(64):
        b = blob_for_ref(f"m42-doc-{i:08d}-1")
        fmts.add(
            "png" if b[:8] == _MAGIC
            else "jpeg" if b[:2] == b"\xff\xd8"
            else "bmp"
        )
    assert fmts == {"png", "jpeg", "bmp"}
