"""Content-defined chunking (Gear/FastCDC family) for binary dedup.

Fixed-size chunking breaks the moment one byte is inserted: every
downstream chunk boundary shifts, so a re-upload with a prepended
header shares ZERO chunks with its original.  Content-defined
boundaries are cut where a rolling hash of the trailing window hits a
mask condition — a pure function of local content — so after an
insertion the boundaries RESYNCHRONIZE and everything past the first
affected chunk dedups again.  This is the storage-side dedup that
complements the perceptual (phash) and exact (md5) image dedup ops:
those ask "same picture?", CDC asks "same bytes, possibly shifted?"
— the re-upload/mirror/partial-edit case a 10^12-blob store meets
constantly.

Gear hash (Xia et al., FastCDC, USENIX ATC'16): h' = (h << 1) + G[b],
boundary when (h & MASK) == 0.  The left shift ages each byte out of
the top bit after 64 steps, so h at position i depends on only the
trailing 64 bytes — which makes the whole hash sequence computable as
64 shifted vector adds (a convolution), no per-byte Python loop:

    h[i] = sum_{k=0..63} (G[data[i-k]] << k)  (mod 2^64)

Boundary positions are then a vectorized mask test; only the sparse
min/max-length enforcement walks candidates in Python (~n/avg items).
"""

from __future__ import annotations

import hashlib

import numpy as np

# deterministic gear table: 256 random uint64, fixed seed — part of
# the chunking definition (both the kernel and the fixture generator's
# independent re-derivation read this exact table)
_G = np.random.default_rng(0xCDC).integers(
    0, 1 << 64, size=256, dtype=np.uint64
)

CDC_MIN = 64        # never cut before this many bytes in a chunk
CDC_MAX = 1024      # force a cut at this length
CDC_MASK = np.uint64(0xFF)  # avg chunk ~256 bytes (8 mask bits)


def gear_hashes(data: bytes) -> np.ndarray:
    """The full rolling-hash sequence h[0..n-1] as uint64 — h[i] is
    the gear hash after consuming byte i."""
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    g = _G[b]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(64):
        if k >= n:
            break
        # contribution of the byte k positions back, aged by k shifts
        h[k:] += g[: n - k] << np.uint64(k)
    return h


def cdc_boundaries(data: bytes) -> list:
    """Chunk END offsets (exclusive), covering len(data) exactly.

    A position i (0-based, meaning the chunk would end at i+1) is a
    CANDIDATE when (h[i] & CDC_MASK) == 0; a candidate is taken only
    if the current chunk has reached CDC_MIN bytes, and a cut is
    forced at CDC_MAX regardless.  The final partial chunk always
    ends at n."""
    n = len(data)
    if n == 0:
        return []
    h = gear_hashes(data)
    cand = np.nonzero((h & CDC_MASK) == 0)[0]
    ends = []
    start = 0
    while start < n:
        limit = min(start + CDC_MAX, n)
        # first candidate at offset >= start + CDC_MIN - 1; cut there
        # if it lands before the max-size limit, else force-cut at it
        ci = int(np.searchsorted(cand, start + CDC_MIN - 1))
        if ci < len(cand) and int(cand[ci]) < limit:
            end = int(cand[ci]) + 1
        else:
            end = limit
        ends.append(end)
        start = end
    return ends


def cdc_chunks(data: bytes) -> list:
    """(chunk_idx, offset, length, md5hex) for every CDC chunk."""
    out = []
    start = 0
    for i, end in enumerate(cdc_boundaries(data)):
        out.append(
            (i, start, end - start,
             hashlib.md5(data[start:end]).hexdigest())
        )
        start = end
    return out


def fixed_chunks(data: bytes, size: int = 256) -> list:
    """(chunk_idx, offset, length, md5hex) for fixed-size chunking —
    the baseline CDC is measured against (tests pin that a prefix
    insertion destroys fixed-chunk sharing but not CDC sharing)."""
    return [
        (i, o, min(size, len(data) - o),
         hashlib.md5(data[o:o + size]).hexdigest())
        for i, o in enumerate(range(0, len(data), size))
    ]
