"""Pure-NumPy 24-bit BMP encoder/decoder.

The reference loads images through SDL_image with format autodetect
(``load_image``, reference source/sdl/our_sdl.c:20-31); its committed
sample pages include an uncompressed 24bpp BMP (img/image.bmp).  This
container has no image codec libraries, so media blobs in this engine
are uncompressed 24-bit BMPs, encoded/decoded with NumPy only.  The
decoder also accepts 32bpp BI_RGB for robustness.

BMP layout (Windows BITMAPINFOHEADER, BI_RGB):
  bytes 0-13   BITMAPFILEHEADER: 'BM', file size, reserved, pixel offset
  bytes 14-53  BITMAPINFOHEADER: header size 40, width, height (positive
               => bottom-up rows), planes=1, bpp, compression=0, ...
  pixel data   rows bottom-up, pixels BGR, each row padded to 4 bytes
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")

# Decode-bomb guards (dead-letter robustness at 10^12 blobs): a corrupt
# header that *declares* absurd dimensions, or a small zlib payload that
# *expands* into gigabytes, must raise ValueError BEFORE the allocation
# happens — an executor that stalls or OOMs on one poisoned blob takes
# its whole task (and every healthy blob in the same batch) down with
# it, and `except Exception` in the quarantine kernel cannot catch an
# OOM kill.  67 MP is ~40x the largest reference page; the byte cap
# covers a 67 MP page at 4 bytes/px.  Shared by the PNG/JPEG decoders.
MAX_PIXELS = 1 << 26
MAX_DECOMPRESSED = (MAX_PIXELS << 2) + (1 << 16)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24bpp BMP."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad

    # BGR, bottom-up, padded rows — build with one vectorized copy.
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, :row_bytes] = rgb[::-1, :, ::-1].reshape(h, row_bytes)

    pixel_offset = _FILE_HEADER.size + _INFO_HEADER.size
    file_size = pixel_offset + h * stride
    header = _FILE_HEADER.pack(b"BM", file_size, 0, 0, pixel_offset)
    info = _INFO_HEADER.pack(40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
    return header + info + out.tobytes()


def encode_media_blob(rgb: np.ndarray) -> bytes:
    """zlib-wrapped BMP — the synth corpus blob format.  Page bitmaps
    are mostly background and compress ~20x, which cuts blob shuffle
    bytes accordingly; media_ref blobs are opaque to the pipeline, which
    sniffs the format on decode."""
    return zlib.compress(encode_bmp(rgb), level=1)


def decode_media_blob(data: bytes) -> np.ndarray:
    """Decode a media blob with format autodetect (the Spark analog of
    the reference's IMG_Load sniffing, our_sdl.c:20-31): raw BMP ('BM'
    magic), PNG, JPEG (hand-rolled baseline grayscale codec, jpeg.py),
    or zlib-wrapped BMP (0x78 first byte).  Raises ValueError on
    anything else."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_gray

        gray = decode_jpeg_gray(data)
        return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))
    if data[:1] == b"\x78":
        # Bounded inflate: a zlib bomb stops at the cap instead of
        # filling executor memory.  d.eof must ALSO hold: a blob
        # truncated after the last deflate block but before the adler32
        # trailer (the realistic partial-upload shape) returns the full
        # payload with eof=False and NO error — without this check the
        # corrupt blob silently decodes as healthy, the validation the
        # pre-cap zlib.decompress() path used to enforce (code-review
        # fix; the PNG path already checks d.eof).
        d = zlib.decompressobj()
        out = d.decompress(data, MAX_DECOMPRESSED + 1)
        if len(out) > MAX_DECOMPRESSED:
            raise ValueError("zlib-BMP expands past the decode cap")
        if not d.eof:
            raise ValueError("zlib-BMP stream truncated before its trailer")
        return decode_bmp(out)
    raise ValueError("unknown media blob format")


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32bpp BMP into an (h, w, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    _, _, _, _, pixel_offset = _FILE_HEADER.unpack_from(data, 0)
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _INFO_HEADER.unpack_from(
        data, 14
    )
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (hdr={hdr_size} bpp={bpp} comp={compression})")
    if w <= 0 or h == 0 or w * abs(h) > MAX_PIXELS:
        raise ValueError("implausible BMP dimensions")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=pixel_offset)
    rows = raw.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
