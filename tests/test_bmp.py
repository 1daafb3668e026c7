import numpy as np
import pytest

from ocr_gang_spark.kernels.bmp import decode_bmp, encode_bmp


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 64])
@pytest.mark.parametrize("h", [1, 2, 7])
def test_roundtrip_all_paddings(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....")
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)


def test_decodes_32bpp():
    # hand-build a 1x1 32bpp BI_RGB BMP: pixel BGRA = 01 02 03 FF -> RGB (3,2,1)
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
    data = header + info + bytes([1, 2, 3, 255])
    assert decode_bmp(data).tolist() == [[[3, 2, 1]]]


def test_media_blob_roundtrip_and_sniff():
    from ocr_gang_spark.kernels.bmp import decode_media_blob, encode_media_blob

    from ocr_gang_spark.atlas import render_page

    img = render_page("Hello World", key="blob")[0]
    z = encode_media_blob(img)
    assert len(z) < len(encode_bmp(img)) / 5  # page bitmaps compress well
    assert np.array_equal(decode_media_blob(z), img)
    assert np.array_equal(decode_media_blob(encode_bmp(img)), img)  # raw passthrough
    with pytest.raises(ValueError):
        decode_media_blob(b"\x00\x01\x02")
