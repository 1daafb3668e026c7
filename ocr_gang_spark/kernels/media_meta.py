"""Multimodal media kernels: typed metadata, audio, video frames.

A 100TB training-data pipeline treats images/audio/video as opaque
binary columns with typed metadata and decodes inside Arrow-batched
kernels.  This container has no media libraries, so the formats here
are chosen to be fully decodable with stdlib + NumPy — every path is
REAL (no stubbed decodes):

* image metadata — header sniffing for the blob formats the pipeline
  carries (BMP / zlib-BMP / PNG / JPEG), without decoding pixel data;
* audio — canonical WAV (RIFF PCM16 mono), ~60 lines of struct codec;
  features are plain DSP (RMS, zero-crossing rate);
* video — a minimal framed container ("OGVF": magic, frame count,
  offsets, PNG-encoded frames) standing in for a real codec's frame
  index; frame-sampling reads only the sampled frames' byte ranges —
  the access pattern that matters at scale (decode cost proportional
  to frames *kept*, not frames stored).

Baseline grayscale JPEG is hand-rolled in jpeg.py (encoder + decoder);
H.264-class video codecs would need real libraries and stay out of
scope — the OGVF container models the framed-access pattern instead.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, List, Tuple

import numpy as np

from .png import decode_png, encode_png

# ---------------------------------------------------------------------------
# Typed metadata (header sniff, no pixel decode)
# ---------------------------------------------------------------------------


def sniff_media_meta(blob: bytes) -> Tuple[str, int, int]:
    """(format, width, height) from headers only."""
    if blob[:2] == b"BM":
        w, h = struct.unpack_from("<ii", blob, 18)
        return "bmp", int(w), abs(int(h))
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", blob, 16)
        return "png", int(w), int(h)
    if blob[:1] == b"\x78":
        # zlib-wrapped BMP: the 54-byte header is in the first deflate
        # block; decompress just enough for the dimensions
        head = zlib.decompressobj().decompress(blob, 64)
        w, h = struct.unpack_from("<ii", head, 18)
        return "bmp-zlib", int(w), abs(int(h))
    if blob[:2] == b"\xff\xd8":
        from .jpeg import jpeg_dims

        try:
            h, w = jpeg_dims(blob)
        except (ValueError, struct.error):
            return "jpeg", -1, -1  # detected; header truncated/foreign
        return "jpeg", w, h
    if blob[:4] == b"OGVF":
        n_frames, w, h = struct.unpack_from("<III", blob, 4)
        return "ogvf", int(w), int(h)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav", -1, -1
    return "unknown", -1, -1


# ---------------------------------------------------------------------------
# Audio: WAV PCM16 mono (RIFF) codec + features
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header WAV."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(blob: bytes) -> Tuple[int, np.ndarray]:
    """WAV -> (sample_rate, int16 mono samples).  Walks RIFF chunks, so
    files with extra chunks (LIST, fact) decode too."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        tag, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt} ch={channels} bits={bits})")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("truncated WAV")
    return rate, np.frombuffer(data, dtype="<i2")


def audio_features(samples: np.ndarray, rate: int) -> Tuple[int, float, float, float]:
    """(n_samples, duration_s, rms, zero_crossing_rate) — plain DSP."""
    x = np.asarray(samples, dtype=np.float64)
    n = x.size
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    return n, n / rate, rms, zcr


def synth_audio_blob(ref: str, rate: int = 16000) -> bytes:
    """Deterministic audio for a ref: seeded sine mix + noise, 0.2-1.0s."""
    import hashlib

    digest = hashlib.sha256(("aud:" + ref).encode()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    dur = 0.2 + 0.8 * rng.random()
    t = np.arange(int(rate * dur)) / rate
    f0 = 100.0 + 900.0 * rng.random()
    sig = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(t.size)
    return encode_wav((np.clip(sig, -1, 1) * 32000).astype(np.int16), rate)


# ---------------------------------------------------------------------------
# Video: OGVF framed container (PNG frames + offset index)
# ---------------------------------------------------------------------------


def encode_video(frames: List[np.ndarray]) -> bytes:
    """frames: list of (h, w, 3) uint8, equal shapes -> OGVF blob.
    Layout: 'OGVF' | n,w,h (u32 LE) | n offsets+lengths | PNG frames."""
    h, w, _ = frames[0].shape
    payloads = [encode_png(f, level=1) for f in frames]
    head = b"OGVF" + struct.pack("<III", len(frames), w, h)
    idx_size = len(payloads) * 8
    off = len(head) + idx_size
    idx = b""
    for p in payloads:
        idx += struct.pack("<II", off, len(p))
        off += len(p)
    return head + idx + b"".join(payloads)


def video_frame_index(blob: bytes) -> List[Tuple[int, int]]:
    if blob[:4] != b"OGVF":
        raise ValueError("not an OGVF container")
    n, _w, _h = struct.unpack_from("<III", blob, 4)
    return [struct.unpack_from("<II", blob, 16 + 8 * i) for i in range(n)]


def sample_frames(blob: bytes, stride: int = 2) -> Iterator[Tuple[int, np.ndarray]]:
    """Decode every ``stride``-th frame only — the index makes sampling
    cost proportional to frames kept (at scale, the whole point of a
    framed container over re-decoding the full stream)."""
    for i, (off, length) in enumerate(video_frame_index(blob)):
        if i % stride:
            continue
        yield i, decode_png(blob[off : off + length])


def synth_video_blob(ref: str, size: int = 32) -> bytes:
    """Deterministic tiny video: 4-10 frames of a moving ink block."""
    import hashlib

    digest = hashlib.sha256(("vid:" + ref).encode()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    n = int(rng.integers(4, 11))
    frames = []
    x = int(rng.integers(0, size - 8))
    for _ in range(n):
        f = np.full((size, size, 3), 255, dtype=np.uint8)
        f[8:24, x : x + 8] = 0
        frames.append(f)
        x = (x + 3) % (size - 8)
    return encode_video(frames)
