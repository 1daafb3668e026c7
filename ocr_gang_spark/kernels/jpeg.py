"""Pure-NumPy baseline JPEG codec (grayscale, 8-bit, JFIF).

Completes the reference's image-load autodetect surface (``load_image``,
reference source/sdl/our_sdl.c:20-31 — SDL_image accepts BMP/PNG/JPG):
with no codec libraries in this container, the DCT path is hand-rolled
from the public JPEG specification (ITU-T T.81).

Scope:
* encoder: single-component (grayscale) baseline sequential, standard
  Annex-K luminance quantization table scaled by the libjpeg quality
  rule, standard DC/AC luminance Huffman tables, no restart markers;
* decoder: baseline sequential (SOF0), 8-bit, single-component streams
  (the encoder's output and any grayscale baseline JPEG); tables are
  read from the stream's DQT/DHT segments, so the decoder does not
  assume the encoder's.  Multi-component (color) and progressive
  streams raise a clear ValueError.

Performance note: entropy decode is a sequential per-symbol loop (a
16-bit prefix LUT makes it one dict-free step per symbol, ~tens of ms
per page) — fine for metadata/validation queries, but the OCR hot path
keeps lossless formats; at production scale this kernel is where a real
codec library (libjpeg-turbo) would slot in, with identical Spark-side
plumbing.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

from .bmp import MAX_PIXELS

# Standard luminance quantization table (T.81 Annex K.1), natural order.
QTABLE_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# Zigzag scan order: natural (row-major) index of each scan position.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # scan position of each natural index

# Standard DC/AC luminance Huffman tables (T.81 Annex K.3):
# BITS[i] = number of codes of length i+1; HUFFVAL in code order.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """(code, length) per symbol via the T.81 canonical construction."""
    if sum(bits) != len(vals):
        raise ValueError("Huffman BITS/HUFFVAL mismatch")
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid Huffman table (code overflow)")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)

# Orthonormal 8x8 DCT-II matrix: D = C @ f @ C.T is the JPEG FDCT.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex-K table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QTABLE_LUM * scale + 50) // 100
    return np.clip(q, 1, 255)


def _pack_fields(vals, lens) -> bytes:
    """Vectorized MSB-first bit packing of (value, bit-length) fields,
    1-padded to a byte boundary, with 0xFF byte stuffing.  The encoder
    emits ~20k fields per noisy page; a per-symbol Python bit writer
    measured 4.7us/field — this packs the whole stream in a handful of
    NumPy passes instead."""
    lens = np.asarray(lens, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.uint64)
    starts = np.cumsum(lens) - lens
    total = int(starts[-1] + lens[-1]) if len(lens) else 0
    reps = np.repeat(np.arange(len(lens)), lens)
    offs = np.arange(total) - np.repeat(starts, lens)
    shift = (lens[reps] - 1 - offs).astype(np.uint64)
    bits = ((vals[reps] >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    raw = np.packbits(bits)
    stuff = np.nonzero(raw == 0xFF)[0]
    if len(stuff):
        raw = np.insert(raw, stuff + 1, 0)
    return raw.tobytes()


def encode_jpeg_gray(img: np.ndarray, quality: int = 92) -> bytes:
    """Encode an (h, w) uint8 grayscale array as a baseline JFIF JPEG."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects (h, w) uint8")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _quality_table(quality)
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    nh, nw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(nh, 8, nw, 8).transpose(0, 2, 1, 3)  # (nh, nw, 8, 8)
    coef = np.einsum("ux,ijxy,vy->ijuv", _C, blocks, _C, optimize=True)
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(nh * nw, 64)[:, ZIGZAG]  # scan order per block

    # Field generation: plain-int Python over NONZERO coefficients only
    # (appends into parallel lists), then one vectorized packing pass.
    dc_enc, ac_enc, zrl, eob = _DC_ENC, _AC_ENC, _AC_ENC[0xF0], _AC_ENC[0x00]
    vals: list = []
    lens: list = []
    prev_dc = 0
    nz_b, nz_k = np.nonzero(zz[:, 1:])
    nz_splits = np.searchsorted(nz_b, np.arange(1, zz.shape[0]))
    nz_k_list = np.split(nz_k + 1, nz_splits)
    for blk, nz in zip(zz.tolist(), nz_k_list):
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        size = diff.bit_length() if diff > 0 else (-diff).bit_length()
        code, length = dc_enc[size]
        vals.append(code)
        lens.append(length)
        if size:
            vals.append(diff if diff > 0 else diff + (1 << size) - 1)
            lens.append(size)
        prev = 0
        for k in nz.tolist():
            run = k - prev - 1
            prev = k
            while run >= 16:
                vals.append(zrl[0])
                lens.append(zrl[1])
                run -= 16
            v = blk[k]
            size = v.bit_length() if v > 0 else (-v).bit_length()
            code, length = ac_enc[(run << 4) | size]
            vals.append(code)
            lens.append(length)
            vals.append(v if v > 0 else v + (1 << size) - 1)
            lens.append(size)
        if prev < 63:
            vals.append(eob[0])
            lens.append(eob[1])
    entropy = _pack_fields(vals, lens)

    qzz = q.reshape(64)[ZIGZAG].astype(np.uint8)  # DQT stores scan order
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + qzz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


@functools.lru_cache(maxsize=32)
def _decode_lut(bits: bytes, vals: bytes):
    """16-bit prefix lookup: peek 16 bits -> packed (symbol << 8 | code
    length) as a plain Python list (scalar list indexing beats numpy
    scalar indexing ~3x in the sequential decode loop; one fused table
    means one index per symbol).  Memoized on the raw DHT bytes — real
    corpora overwhelmingly reuse the Annex K tables, so the 65536-entry
    build (and its ndarray->list conversion, ~2.6ms) happens once per
    distinct table, not once per image."""
    sym = np.zeros(1 << 16, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return ((sym << 8) | ln).tolist()


def _parse_headers(data: bytes, qtables: dict, htables: dict):
    """Walk marker segments up to SOS; fills qtables/htables in place.
    Returns (scan_start, h, w, qsel, dc_id, ac_id)."""
    pos = 2
    h = w = qsel = scan_start = None
    dc_id = ac_id = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI with no scan
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                if tbl.size != 64:
                    raise ValueError("truncated DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored in scan order
                qtables[tq] = nat.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = bytes(body[b + 1 : b + 17])
                n = sum(bits)
                vals = bytes(body[b + 17 : b + 17 + n])
                htables[(cls, tid)] = _decode_lut(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) JPEG supported")
            sampling = body[7]  # body[6] is the component id
            if sampling != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            qsel = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", body, 0)
            if interval:
                raise ValueError("restart markers unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            scan_start = pos
            break
    return scan_start, h, w, qsel, dc_id, ac_id


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG into (h, w) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    qtables: dict = {}
    htables: dict = {}
    try:
        scan_start, h, w, qsel, dc_id, ac_id = _parse_headers(data, qtables, htables)
    except (IndexError, struct.error):
        raise ValueError("truncated JPEG header") from None
    if h is None or scan_start is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")
    if qsel not in qtables:
        raise ValueError("missing quantization table")
    if (0, dc_id) not in htables or (1, ac_id) not in htables:
        raise ValueError("missing Huffman table")
    if h == 0 or w == 0 or h * w > MAX_PIXELS:
        raise ValueError("implausible JPEG dimensions")

    # de-stuff the entropy segment up to EOI
    raw = data[scan_start:]
    end = raw.find(b"\xff\xd9")
    seg = raw[: end if end >= 0 else len(raw)]
    entropy = seg.replace(b"\xff\x00", b"\xff")

    # Entropy decode: inherently sequential, so the loop is tuned for
    # CPython — inlined MSB-first bit window (acc/nbits ints, no method
    # calls), one fused memoized Huffman list per table (symbol<<8|len,
    # a single list index per symbol), 32-bit accumulator refills, and
    # coefficients into a flat Python list.
    dc_tab = htables[(0, dc_id)]
    ac_tab = htables[(1, ac_id)]
    nh, nw = (h + 7) // 8, (w + 7) // 8
    nblocks = nh * nw
    out = [0] * (nblocks * 64)
    pad = entropy + b"\xff" * 8  # spec pad bits are 1s
    npad = len(entropy)
    acc = nbits = p = 0
    prev_dc = 0
    try:
        for base in range(0, nblocks * 64, 64):
            if nbits < 16:
                if p >= npad + 4:
                    raise ValueError("truncated entropy stream")
                acc = ((acc << 32) | int.from_bytes(pad[p : p + 4], "big")) & (
                    (1 << (nbits + 32)) - 1
                )
                p += 4
                nbits += 32
            e = dc_tab[acc >> (nbits - 16)]
            length = e & 0xFF
            if length == 0:
                raise ValueError("corrupt entropy stream (DC)")
            size = e >> 8
            nbits -= length
            acc &= (1 << nbits) - 1
            if size:
                if nbits < size:
                    if p >= npad + 4:
                        raise ValueError("truncated entropy stream")
                    acc = (acc << 32) | int.from_bytes(pad[p : p + 4], "big")
                    p += 4
                    nbits += 32
                v = acc >> (nbits - size)
                nbits -= size
                acc &= (1 << nbits) - 1
                # T.81 EXTEND: value bits -> signed coefficient
                prev_dc += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            out[base] = prev_dc
            k = 1
            while k < 64:
                if nbits < 16:
                    if p >= npad + 4:
                        raise ValueError("truncated entropy stream")
                    acc = ((acc << 32) | int.from_bytes(pad[p : p + 4], "big")) & (
                        (1 << (nbits + 32)) - 1
                    )
                    p += 4
                    nbits += 32
                e = ac_tab[acc >> (nbits - 16)]
                length = e & 0xFF
                if length == 0:
                    raise ValueError("corrupt entropy stream (AC)")
                rs = e >> 8
                nbits -= length
                acc &= (1 << nbits) - 1
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0xF
                if k > 63:
                    raise ValueError("AC run past block end")
                if nbits < size:
                    if p >= npad + 4:
                        raise ValueError("truncated entropy stream")
                    acc = (acc << 32) | int.from_bytes(pad[p : p + 4], "big")
                    p += 4
                    nbits += 32
                v = acc >> (nbits - size)
                nbits -= size
                acc &= (1 << nbits) - 1
                out[base + k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                k += 1
    except IndexError:
        raise ValueError("truncated entropy stream") from None
    zz = np.array(out, dtype=np.int64).reshape(nblocks, 64)

    coef = np.zeros((nh * nw, 64), dtype=np.int64)
    coef[:, ZIGZAG] = zz  # back to natural order
    q = qtables[qsel].reshape(64)
    deq = (coef * q).reshape(nh, nw, 8, 8).astype(np.float64)
    pix = np.einsum("xu,ijuv,yv->ijxy", _C.T, deq, _C.T, optimize=True) + 128.0
    img = pix.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


def jpeg_dims(data: bytes):
    """(height, width) from the SOF0/SOF2 header without decoding."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w, _ = struct.unpack_from(">BHHB", data, pos + 4)
            return int(h), int(w)
        if marker == 0xDA:
            break
        pos += 2 + seglen
    raise ValueError("no SOF header found")
