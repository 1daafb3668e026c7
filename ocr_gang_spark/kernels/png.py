"""Pure-NumPy/zlib PNG codec (no codec libraries in this container).

The reference loads pages through SDL_image with BMP/PNG/JPG format
autodetect (``load_image``, reference source/sdl/our_sdl.c:20-31) and
its committed samples include PNGs (img/'Lorem 2.png', the 520 training
glyphs).  Real corpora are not BMP, so the engine needs PNG ingestion;
this module hand-rolls the format with stdlib ``zlib`` + NumPy only.

Decoder scope (asserted, not silently wrong): 8-bit depth, color types
0 (gray), 2 (RGB), 6 (RGBA — alpha dropped), no interlace, all five
row filters (None/Sub/Up/Average/Paeth).  The encoder emits color type
2 with filter 0 rows (and Up-filtered rows when they compress better —
page bitmaps are vertically repetitive), which also keeps the decode
fast path fully vectorized.

Baseline grayscale JPEG is hand-rolled in the sibling ``jpeg.py``
(encoder + Huffman/DCT decoder); ``decode_media_blob`` dispatches the
JPEG magic there.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .bmp import MAX_PIXELS

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray, level: int = 6) -> bytes:
    """Encode (h, w, 3) uint8 RGB as an 8-bit truecolor PNG.

    Rows use filter 2 (Up) after the first — page bitmaps repeat
    vertically, so Up turns most rows into zero bytes and deflate eats
    them; row 0 uses filter 0.  Both are vectorized on decode.
    """
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = rgb.shape
    flat = rgb.reshape(h, w * 3)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[0, 0] = 0
    raw[0, 1:] = flat[0]
    if h > 1:
        raw[1:, 0] = 2  # Up filter
        raw[1:, 1:] = flat[1:] - flat[:-1]  # uint8 wraparound == mod 256
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the PNG row filters.  raw is (h, 1 + w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            cur = line
            # per-lane prefix sum mod 256 (uint8 addition wraps)
            for lane in range(bpp):
                lane_v = cur[lane::bpp].astype(np.uint64)
                cur[lane::bpp] = np.cumsum(lane_v).astype(np.uint8)
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 3:  # Average: + floor((left + up) / 2) — sequential
            cur = line
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — sequential predictor selection
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit gray/RGB/RGBA non-interlaced PNG to (h, w, 3) uint8."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    w = h = None
    color_type = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2, 6) or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("implausible PNG dimensions")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    # Bounded inflate (see kernels/bmp.py MAX_PIXELS note): expect is
    # capped by the dimension check above, so a zlib bomb in the IDAT
    # stream stops at expect+1 bytes instead of filling executor memory.
    expect = h * (1 + w * bpp)
    d = zlib.decompressobj()
    raw = np.frombuffer(d.decompress(b"".join(idat), expect + 1), dtype=np.uint8)
    if raw.size != expect or not d.eof:
        raise ValueError(f"PNG pixel data truncated: {raw.size} != {expect}")
    recon = _unfilter(raw.reshape(h, 1 + w * bpp), h, w, bpp)
    px = recon.reshape(h, w, bpp)
    if color_type == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if color_type == 6:
        return np.ascontiguousarray(px[:, :, :3])
    return np.ascontiguousarray(px)
