"""Glyph classifier: Conv3x3(8)->MaxPool2x2->flatten->MLP(1352-64-52).

Batched float64 NumPy implementation of the reference inference path
(N1-N8 in SURVEY.md §2.4), plus the reference's versioned ASCII weight
file format.  File:line citations point into /root/reference.

Shapes (reference source/network/cnn.h:8-19, network.h:68):
  input   (B, 28, 28) float64 in {0.0, 1.0}
  conv    valid padding 28->26, 8 filters 3x3, hard ReLU (cnn.c:62 —
          note: *not* the leaky ReLU the MLP hidden layer uses)
  pool    2x2 stride 2 -> (B, 8, 13, 13)
  flatten filter-major (f, y, x) C-contiguous -> (B, 1352) (cnn.c:90-98)
  hidden  leaky ReLU slope 0.01 (tools.c:154-158), 64 units
  output  52 logits; softmax (max-subtracted, tools.c:165-185); argmax
          with first-index tie-break (IndexAnswer tools.c:343-355);
          0-25 -> 'A'-'Z', 26-51 -> 'a'-'z' (RetrieveChar tools.c:357-364)
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field

import numpy as np

NUM_FILTERS = 8
CONV_SIZE = 3
INPUT_W = 28
POOL_H = 13
POOL_W = 13
FLATTEN_SIZE = NUM_FILTERS * POOL_H * POOL_W  # 1352
HIDDEN = 64
OUTPUTS = 52

CLASS_CHARS = np.array(list(string.ascii_uppercase + string.ascii_lowercase))


@dataclass
class OcrWeights:
    """All inference parameters (Adam state kept only for file round-trip)."""

    filters: np.ndarray  # (8, 3, 3)
    conv_biases: np.ndarray  # (8,)
    hidden_w: np.ndarray  # (1352, 64)  row i = weights out of input i
    hidden_b: np.ndarray  # (64,)
    output_w: np.ndarray  # (64, 52)    row h = weights out of hidden h
    output_b: np.ndarray  # (52,)
    mlp_adam: dict = field(default_factory=dict)
    cnn_adam: dict = field(default_factory=dict)


# Keep the (chunk, 8, 26, 26) float64 accumulator L2-resident (~0.7MB at
# 16): measured on a 32-core box, chunk=16 gives ~5.5x the contended
# throughput of chunk=256 (the 11MB accumulator saturates the memory bus
# when every core runs the kernel).
_CONV_CHUNK = 16


def cnn_forward(images: np.ndarray, filters: np.ndarray, biases: np.ndarray) -> np.ndarray:
    """N1-N4 — batched conv+ReLU+maxpool+flatten.

    Same math as the reference ``cnn_forward_infer`` (cnn.c:118-141; the
    training-path ``cnn_forward`` cnn.c:45-99 computes identical values).

    Implemented as 9 shifted fused multiply-adds accumulating into a
    per-chunk (b, 8, 26, 26) buffer: this (a) adds terms in the exact
    bias + f00..f22 order of the C source (cnn.c:58-61) and (b) avoids
    the ~50x-batch-size contiguous copy an einsum/tensordot of the
    sliding-window view would materialize — that copy saturates memory
    bandwidth when 32 executor threads run the kernel concurrently.
    """
    imgs = np.ascontiguousarray(images, dtype=np.float64).reshape(-1, INPUT_W, INPUT_W)
    n = imgs.shape[0]
    out = np.empty((n, FLATTEN_SIZE), dtype=np.float64)
    cw = INPUT_W - CONV_SIZE + 1  # 26
    for s in range(0, n, _CONV_CHUNK):
        chunk = imgs[s : s + _CONV_CHUNK]
        b = chunk.shape[0]
        conv = np.empty((b, NUM_FILTERS, cw, cw), dtype=np.float64)
        conv[:] = biases[None, :, None, None]
        for i in range(CONV_SIZE):
            for j in range(CONV_SIZE):
                conv += (
                    chunk[:, None, i : i + cw, j : j + cw]
                    * filters[None, :, i, j, None, None]
                )
        np.maximum(conv, 0.0, out=conv)  # hard ReLU (cnn.c:62)
        pool = conv.reshape(b, NUM_FILTERS, POOL_H, 2, POOL_W, 2).max(axis=(3, 5))
        out[s : s + b] = pool.reshape(b, FLATTEN_SIZE)  # (f, y, x) C-order flatten
    return out


def _conv_lut(filters: np.ndarray, biases: np.ndarray) -> np.ndarray:
    """(512, 8) lookup table: ReLU(bias + 3x3 dot) for every possible
    binary 3x3 neighborhood pattern.

    Glyph matrices are binary {0,1} (ImageToMatrix semantics), so the
    conv reduces to indexing this table by the 9-bit neighborhood
    pattern.  Accumulation order matches the C source exactly
    (bias + t00 + t01 + ... + t22, cnn.c:58-61; a zero term adds +0.0
    which is an IEEE no-op), so LUT values are bit-identical to the
    dense float64 conv — pinned by tests.
    """
    lut = np.empty((512, NUM_FILTERS), dtype=np.float64)
    for p in range(512):
        for f in range(NUM_FILTERS):
            s = biases[f]
            k = 0
            for i in range(CONV_SIZE):
                for j in range(CONV_SIZE):
                    if (p >> k) & 1:
                        s = s + filters[f, i, j]
                    k += 1
            lut[p, f] = s if s > 0.0 else 0.0
    return lut


def _conv_lut16(lut512: np.ndarray) -> np.ndarray:
    """(65536, 8) fused conv+pool LUT: entry p = the pooled output for a
    4x4 image block whose 16 cells are the bits of p (bit 4*i+j = cell
    (i, j)).

    A pooled cell (py, px) maxes the 4 conv positions (2py+dy, 2px+dx),
    dy,dx in {0,1}; each conv position reads the 3x3 neighborhood at
    block cells (dy+a, dx+b) — all inside the 4x4 block.  Each entry is
    ``max`` of the 4 ReLU'd float64 values the 512-entry LUT holds, i.e.
    exactly the value the runtime pool-max computed before — so this
    stays bit-identical to the dense conv while replacing 4 gathers +
    3 max passes with ONE gather per pooled cell (the dominant memory
    traffic of the whole OCR kernel; each LUT row is one 64B cache line).
    """
    p = np.arange(65536, dtype=np.uint32)
    out = None
    for dy in range(2):
        for dx in range(2):
            idx = np.zeros(65536, dtype=np.uint32)
            for a in range(CONV_SIZE):
                for b in range(CONV_SIZE):
                    idx |= ((p >> (4 * (dy + a) + (dx + b))) & 1) << (3 * a + b)
            v = lut512[idx]
            if out is None:
                out = v
            else:
                np.maximum(out, v, out=out)
    return out


def _lut16_spot_check(lut: np.ndarray, lut512: np.ndarray) -> bool:
    """Validate a loaded fused LUT: shape/dtype plus value spot-checks of
    pseudo-random entries against the (cheaply rebuilt) 512-entry
    neighborhood LUT.  A stale, truncated-then-renamed, or foreign
    ocrgang_lut16_*.npy must never silently corrupt classification
    (ADVICE r1): wrong shape/dtype fails fast, wrong values fail the
    16-entry recomputation with probability ~1 for any real corruption.
    """
    if lut.shape != (65536, NUM_FILTERS) or lut.dtype != np.float64:
        return False
    rng = np.random.default_rng(0xC0FFEE)
    for p in rng.integers(0, 65536, size=16):
        expect = None
        for dy in range(2):
            for dx in range(2):
                idx = 0
                for a in range(CONV_SIZE):
                    for b in range(CONV_SIZE):
                        idx |= ((int(p) >> (4 * (dy + a) + (dx + b))) & 1) << (3 * a + b)
                v = lut512[idx]
                expect = v if expect is None else np.maximum(expect, v)
        if not np.array_equal(lut[int(p)], expect):
            return False
    return True


def _shared_lut16(filters: np.ndarray, biases: np.ndarray) -> np.ndarray:
    """Build (or map) the fused LUT as a host-shared read-only mmap.

    Every Spark python worker on a host needs the same 4MB table; keeping
    one private copy per worker multiplies the hot cache working set by
    the worker count (16 workers x 4MB evicts itself out of shared L3
    under concurrent JVM traffic).  A content-addressed file in a
    user-scoped 0700 subdirectory of /dev/shm, mapped read-only, gives
    all workers of this user the SAME physical pages — one 4MB resident
    copy per host regardless of worker count.  Every mapped file is
    validated (shape + dtype + value spot-checks) before use; any
    mismatch falls back to a freshly built private in-memory LUT.
    """
    import hashlib
    import os
    import tempfile

    lut512 = _conv_lut(filters, biases)

    shm_root = os.environ.get("SPARK_GRAFT_LUT_DIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    shm = os.path.join(shm_root, f"ocrgang_{os.getuid()}")
    key = hashlib.sha1(
        np.ascontiguousarray(filters, dtype=np.float64).tobytes()
        + np.ascontiguousarray(biases, dtype=np.float64).tobytes()
    ).hexdigest()[:16]
    path = os.path.join(shm, f"ocrgang_lut16_{key}.npy")
    if not os.path.exists(path):
        lut = _conv_lut16(lut512)
        tmp = f"{path}.{os.getpid()}.tmp"
        try:
            os.makedirs(shm, mode=0o700, exist_ok=True)
            # O_EXCL + 0600: never follow a planted symlink / shared tmp file
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
            with os.fdopen(fd, "wb") as f:
                np.save(f, lut)
            os.rename(tmp, path)  # atomic: concurrent builders agree on content
        except OSError:
            return lut  # unwritable shm dir — keep the private copy
    try:
        # np.asarray strips the memmap subclass (fancy-indexing on the
        # subclass takes a much slower path) while keeping the same
        # shared mmap buffer — no copy
        lut = np.asarray(np.load(path, mmap_mode="r"))
        if _lut16_spot_check(lut, lut512):
            return lut
    except Exception:
        pass
    return _conv_lut16(lut512)


def conv_lut_for(w: OcrWeights) -> np.ndarray:
    lut = getattr(w, "_conv_lut_cache", None)
    if lut is None:
        lut = _shared_lut16(w.filters, w.conv_biases)
        w._conv_lut_cache = lut
    return lut


def cnn_forward_binary(matrices: np.ndarray, lut) -> np.ndarray:
    """Fast path of N1-N4 for binary inputs: 16 shifted uint16 adds build
    the per-pooled-cell 4x4-block pattern, one fused conv+pool LUT
    gather replaces the float64 conv AND the pool max.  Bit-identical to
    :func:`cnn_forward` on {0,1} inputs (tests assert np.array_equal);
    ~25x less memory traffic than the dense conv, which is what lets the
    kernel scale across many concurrent executor threads on a
    bandwidth-limited box.

    Accepts either the raw (512, 8) neighborhood LUT (tests) or the
    fused (65536, 8) LUT :func:`conv_lut_for` caches per worker.
    """
    vlut = lut[0] if isinstance(lut, tuple) else lut
    if vlut.shape[0] == 512:
        vlut = _conv_lut16(vlut)
    m = (np.asarray(matrices).reshape(-1, INPUT_W, INPUT_W) != 0).astype(np.uint16)
    n = m.shape[0]
    out = np.empty((n, FLATTEN_SIZE), dtype=np.float64)
    # chunk = 512 glyphs: min-of-10 on a quiet box, 20k-glyph batch —
    # 64:228ms / 256:209 / 512:194 / 1024:189 single-worker (the
    # per-chunk Python+numpy dispatch overhead amortizes) while the
    # transient LUT-gather buffer stays ~5.5MB/worker (512*169*8
    # float64), so 8 concurrent extraction workers add <50MB pressure
    for s in range(0, n, 512):
        chunk = m[s : s + 512]
        b = chunk.shape[0]
        # pat[g, py, px] = 16-bit pattern of image block [2py:2py+4, 2px:2px+4]
        pat = np.zeros((b, POOL_H, POOL_W), dtype=np.uint16)
        for i in range(4):
            for j in range(4):
                pat += chunk[:, i : i + 2 * POOL_H - 1 : 2, j : j + 2 * POOL_W - 1 : 2] << (
                    4 * i + j
                )
        out[s : s + b] = vlut[pat].transpose(0, 3, 1, 2).reshape(b, FLATTEN_SIZE)
    return out


def mlp_forward(flat: np.ndarray, w: OcrWeights) -> np.ndarray:
    """N5 — hidden leaky-ReLU(0.01) + output logits (dropout off at inference).

    Reference ``forward_pass`` (network.c:204-265) with
    ``set_training_mode(net, 0)`` as in PerformOCR (ocr.c:132).  The
    reference's skip-zero-input loop is a pure optimization of the same
    matmul.  Softmax (applied by the reference) is argmax-invariant and
    exposed separately via :func:`softmax`.
    """
    hidden = flat @ w.hidden_w + w.hidden_b
    hidden = np.where(hidden > 0.0, hidden, 0.01 * hidden)  # leaky ReLU tools.c:154-158
    return hidden @ w.output_w + w.output_b


def softmax(logits: np.ndarray) -> np.ndarray:
    """Max-subtracted softmax (reference tools.c:165-185), batched."""
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def classify(matrices: np.ndarray, w: OcrWeights) -> np.ndarray:
    """N7+N6 — batched glyph matrices -> characters.

    (B, 28, 28) or (B, 784) {0,1} -> (B,) unicode chars.  np.argmax
    keeps the first maximum, matching IndexAnswer's strict-> scan.
    Uses the binary LUT conv (bit-identical to the dense conv on the
    {0,1} inputs ImageToMatrix produces).
    """
    flat = cnn_forward_binary(matrices, conv_lut_for(w))
    logits = mlp_forward(flat, w)
    return CLASS_CHARS[np.argmax(logits, axis=1)]


def classify_margin_ppm(matrices: np.ndarray, w: OcrWeights):
    """classify() plus a per-glyph confidence: the softmax top1-top2
    probability margin, floored to integer parts-per-million so the
    value is hash-exact across engines/fixtures (float64 softmax is
    deterministic, but an integer column removes any doubt at the
    comparison layer).

    The reference applies softmax before IndexAnswer (ocr.c:158,
    tools.c:165-185); the margin is the natural rejection statistic on
    top of it — it needs no extra forward pass and no calibration
    data.  Returns (chars (B,) '<U1', margin_ppm (B,) int64)."""
    flat = cnn_forward_binary(matrices, conv_lut_for(w))
    logits = mlp_forward(flat, w)
    p = softmax(logits)
    top2 = np.partition(p, -2, axis=1)
    margin = top2[:, -1] - top2[:, -2]
    return (
        CLASS_CHARS[np.argmax(logits, axis=1)],
        np.floor(margin * 1e6).astype(np.int64),
    )


# ---------------------------------------------------------------------------
# Weight-file IO — reference versioned ASCII format
# (save_network/load_network tools.c:252-329, save_cnn/load_cnn tools.c:604-667)
# ---------------------------------------------------------------------------

NET_MAGIC, NET_VERSION = "OCRNET", 2
CNN_MAGIC, CNN_VERSION = "OCRCNN", 2


def _fmt(arr: np.ndarray) -> str:
    return "\n".join(f"{v:.17g}" for v in np.asarray(arr, dtype=np.float64).ravel())


def save_weights(w: OcrWeights, mlp_path: str, cnn_path: str) -> None:
    """Serialize in the reference text format ('%.17g' one value per line)."""
    I, H, O = FLATTEN_SIZE, HIDDEN, OUTPUTS
    ma = w.mlp_adam
    zeros = lambda n: np.zeros(n)  # noqa: E731
    parts = [
        f"{NET_MAGIC} {NET_VERSION} {I} {H} {O}",
        f"{ma.get('t', 0)} {ma.get('b1t', 1.0):.17g} {ma.get('b2t', 1.0):.17g}",
        _fmt(w.hidden_b),
        _fmt(w.hidden_w),
        _fmt(w.output_b),
        _fmt(w.output_w),
        _fmt(ma.get("m_hb", zeros(H))),
        _fmt(ma.get("v_hb", zeros(H))),
        _fmt(ma.get("m_hw", zeros(I * H))),
        _fmt(ma.get("v_hw", zeros(I * H))),
        _fmt(ma.get("m_ob", zeros(O))),
        _fmt(ma.get("v_ob", zeros(O))),
        _fmt(ma.get("m_ow", zeros(H * O))),
        _fmt(ma.get("v_ow", zeros(H * O))),
    ]
    with open(mlp_path, "w") as f:
        f.write("\n".join(parts) + "\n")

    ca = w.cnn_adam
    kc = NUM_FILTERS * CONV_SIZE * CONV_SIZE
    parts = [
        f"{CNN_MAGIC} {CNN_VERSION} {NUM_FILTERS} {CONV_SIZE}",
        f"{ca.get('t', 0)} {ca.get('b1t', 1.0):.17g} {ca.get('b2t', 1.0):.17g}",
        _fmt(w.conv_biases),
        _fmt(w.filters),
        _fmt(ca.get("m_b", zeros(NUM_FILTERS))),
        _fmt(ca.get("v_b", zeros(NUM_FILTERS))),
        _fmt(ca.get("m_f", zeros(kc))),
        _fmt(ca.get("v_f", zeros(kc))),
    ]
    with open(cnn_path, "w") as f:
        f.write("\n".join(parts) + "\n")


def load_weights(mlp_path: str, cnn_path: str) -> OcrWeights:
    """Parse the reference text format with full magic/dimension validation."""
    with open(mlp_path) as f:
        toks = f.read().split()
    if toks[0] != NET_MAGIC or int(toks[1]) != NET_VERSION:
        raise ValueError(f"bad MLP weight file magic/version: {toks[:2]}")
    I, H, O = int(toks[2]), int(toks[3]), int(toks[4])
    if (I, H, O) != (FLATTEN_SIZE, HIDDEN, OUTPUTS):
        raise ValueError(f"incompatible MLP dims {(I, H, O)}")
    t, b1t, b2t = int(toks[5]), float(toks[6]), float(toks[7])
    vals = np.array(toks[8:], dtype=np.float64)
    # weights+biases plus Adam m and v for each => 3x
    need = 3 * (H + I * H + O + H * O)
    if vals.size != need:
        raise ValueError(f"MLP weight file truncated: {vals.size} != {need}")
    pos = 0

    def take(n: int) -> np.ndarray:
        nonlocal pos
        out = vals[pos : pos + n]
        pos += n
        return out

    hidden_b = take(H)
    hidden_w = take(I * H).reshape(I, H)
    output_b = take(O)
    output_w = take(H * O).reshape(H, O)
    mlp_adam = {
        "t": t, "b1t": b1t, "b2t": b2t,
        "m_hb": take(H), "v_hb": take(H),
        "m_hw": take(I * H), "v_hw": take(I * H),
        "m_ob": take(O), "v_ob": take(O),
        "m_ow": take(H * O), "v_ow": take(H * O),
    }

    with open(cnn_path) as f:
        toks = f.read().split()
    if toks[0] != CNN_MAGIC or int(toks[1]) != CNN_VERSION:
        raise ValueError(f"bad CNN weight file magic/version: {toks[:2]}")
    nf, ks = int(toks[2]), int(toks[3])
    if (nf, ks) != (NUM_FILTERS, CONV_SIZE):
        raise ValueError(f"incompatible CNN dims {(nf, ks)}")
    t, b1t, b2t = int(toks[4]), float(toks[5]), float(toks[6])
    vals = np.array(toks[7:], dtype=np.float64)
    kc = NUM_FILTERS * CONV_SIZE * CONV_SIZE
    # biases + filters + m/v biases + m/v filters
    need = NUM_FILTERS + kc + 2 * NUM_FILTERS + 2 * kc
    if vals.size != need:
        raise ValueError(f"CNN weight file truncated: {vals.size} != {need}")
    # same take() closure as the MLP section above: it reads the
    # *current* ``vals``/``pos`` from the enclosing scope, so resetting
    # pos after swapping in the CNN token array continues the pattern
    pos = 0
    conv_biases = take(NUM_FILTERS)
    filters = take(kc).reshape(NUM_FILTERS, CONV_SIZE, CONV_SIZE)
    cnn_adam = {
        "t": t, "b1t": b1t, "b2t": b2t,
        "m_b": take(NUM_FILTERS), "v_b": take(NUM_FILTERS),
        "m_f": take(kc), "v_f": take(kc),
    }

    return OcrWeights(
        filters=filters,
        conv_biases=conv_biases,
        hidden_w=hidden_w,
        hidden_b=hidden_b,
        output_w=output_w,
        output_b=output_b,
        mlp_adam=mlp_adam,
        cnn_adam=cnn_adam,
    )
