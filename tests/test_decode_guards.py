"""Decode-bomb guards (dead-letter robustness, kernels/bmp.py
MAX_PIXELS / MAX_DECOMPRESSED): a corrupt header that declares absurd
dimensions, or a zlib payload that expands far past its size, must
raise ValueError *fast* — before the allocation — so the quarantine
kernel (media_queries.decode_quarantine_stats) can dead-letter the
blob instead of the executor OOMing on it.  Healthy blobs are
untouched (round-trips re-pinned here)."""

import struct
import zlib

import numpy as np
import pytest

from ocr_gang_spark.kernels import bmp as bmp_mod
from ocr_gang_spark.kernels.bmp import (
    decode_bmp,
    decode_media_blob,
    encode_bmp,
)
from ocr_gang_spark.kernels.jpeg import decode_jpeg_gray, encode_jpeg_gray
from ocr_gang_spark.kernels.png import decode_png, encode_png

IMG = (np.arange(24 * 32 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(
    24, 32, 3
)


def test_jpeg_dim_bomb_raises_fast():
    data = bytearray(encode_jpeg_gray(np.ascontiguousarray(IMG[:, :, 0])))
    i = data.find(b"\xff\xc0")
    assert i > 0
    # SOF0 body: len(2) precision(1) h(2) w(2) — patch h/w to 65000^2
    struct.pack_into(">HH", data, i + 5, 65000, 65000)
    with pytest.raises(ValueError, match="implausible JPEG"):
        decode_jpeg_gray(bytes(data))


def test_png_dim_bomb_raises_fast():
    data = bytearray(encode_png(IMG))
    i = data.find(b"IHDR")
    assert i > 0
    struct.pack_into(">II", data, i + 4, 60000, 60000)
    with pytest.raises(ValueError, match="implausible PNG"):
        decode_png(bytes(data))


def test_bmp_dim_bomb_raises_fast():
    data = bytearray(encode_bmp(IMG))
    # BITMAPINFOHEADER at offset 14: size(4) width(4) height(4)
    struct.pack_into("<ii", data, 18, 70000, 70000)
    with pytest.raises(ValueError, match="implausible BMP"):
        decode_bmp(bytes(data))


def test_bmp_nonpositive_width_raises():
    data = bytearray(encode_bmp(IMG))
    struct.pack_into("<i", data, 18, -32)
    with pytest.raises(ValueError, match="implausible BMP"):
        decode_bmp(bytes(data))


def test_zlib_bmp_bomb_stops_at_cap(monkeypatch):
    # Shrink the cap so the test doesn't inflate 256 MiB; the guard
    # reads the module global at call time.
    monkeypatch.setattr(bmp_mod, "MAX_DECOMPRESSED", 1 << 16)
    bomb = zlib.compress(b"\x00" * (1 << 20))
    assert bomb[:1] == b"\x78"
    with pytest.raises(ValueError, match="decode cap"):
        decode_media_blob(bomb)


def test_truncated_zlib_bmp_still_quarantines():
    # The quarantine injection shape: valid zlib magic, unreadable body.
    blob = zlib.compress(encode_bmp(IMG))[:16]
    with pytest.raises(ValueError):
        decode_media_blob(blob)


def test_guards_leave_healthy_blobs_alone():
    assert np.array_equal(decode_png(encode_png(IMG)), IMG)
    assert np.array_equal(decode_bmp(encode_bmp(IMG)), IMG)
    assert np.array_equal(
        decode_media_blob(zlib.compress(encode_bmp(IMG))), IMG
    )
    gray = np.ascontiguousarray(IMG[:, :, 0])
    assert decode_jpeg_gray(encode_jpeg_gray(gray)).shape == gray.shape


def test_zlib_bmp_truncated_trailer_is_rejected():
    """A zlib-BMP cut after its final deflate block but BEFORE the
    4-byte adler32 trailer inflates to the full payload with no error
    from decompressobj — the decoder must still reject it (d.eof),
    or the corrupt blob enters the corpus as a healthy decode
    (code-review fix)."""
    import zlib

    import numpy as np
    import pytest

    from ocr_gang_spark.kernels.bmp import decode_media_blob, encode_bmp

    page = np.full((8, 8, 3), 255, dtype=np.uint8)
    blob = zlib.compress(encode_bmp(page), level=1)
    # sanity: the full blob decodes
    assert decode_media_blob(blob).shape == (8, 8, 3)
    # drop exactly the adler32 trailer: payload complete, stream not
    truncated = blob[:-4]
    d = zlib.decompressobj()
    assert d.decompress(truncated) == encode_bmp(page) and not d.eof
    with pytest.raises(ValueError, match="truncated"):
        decode_media_blob(truncated)
