"""Content-defined chunking kernel pins: hash correctness vs a
per-byte re-derivation, boundary invariants, and the property the
operator exists for — boundary RESYNCHRONIZATION after an insertion,
which fixed-size chunking cannot do."""

import numpy as np

from ocr_gang_spark.kernels.cdc import (
    _G,
    CDC_MASK,
    CDC_MAX,
    CDC_MIN,
    cdc_boundaries,
    cdc_chunks,
    fixed_chunks,
    gear_hashes,
)


def _brute_h(data: bytes) -> list:
    """Independent per-byte gear hash (the kernel vectorizes this as a
    64-shift convolution)."""
    out = []
    for i in range(len(data)):
        v = 0
        for k in range(min(64, i + 1)):
            v = (v + (int(_G[data[i - k]]) << k)) % (1 << 64)
        out.append(v)
    return out


def test_gear_hash_matches_per_byte_derivation():
    rng = np.random.default_rng(3)
    for n in (0, 1, 63, 64, 65, 700):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert [int(x) for x in gear_hashes(data)] == _brute_h(data)


def test_boundary_invariants():
    rng = np.random.default_rng(9)
    for n in (0, 1, CDC_MIN - 1, CDC_MIN, CDC_MAX, CDC_MAX + 1, 9000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        ends = cdc_boundaries(data)
        if n == 0:
            assert ends == []
            continue
        assert ends[-1] == n  # exact coverage
        assert all(a < b for a, b in zip(ends, ends[1:]))  # monotone
        lens = [e - s for s, e in zip([0] + ends[:-1], ends)]
        # every chunk but the last respects [CDC_MIN, CDC_MAX]; the
        # final partial chunk may be short but never over CDC_MAX
        assert all(CDC_MIN <= ln <= CDC_MAX for ln in lens[:-1])
        assert lens[-1] <= CDC_MAX
        # every non-forced cut is a genuine content boundary
        h = gear_hashes(data)
        starts = [0] + ends[:-1]
        for s, e in zip(starts, ends):
            if e - s not in (CDC_MAX,) and e != n:
                assert int(h[e - 1]) & int(CDC_MASK) == 0


def test_resync_after_prefix_insertion_beats_fixed_chunking():
    """The operator's reason to exist: a 64-byte header insertion
    shifts every fixed-size boundary (zero shared chunks) while CDC
    boundaries resynchronize (>= 80% shared)."""
    rng = np.random.default_rng(17)
    data = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    shifted = bytes(rng.integers(0, 256, 64, dtype=np.uint8)) + data

    c1 = {m for _, _, _, m in cdc_chunks(data)}
    c2 = {m for _, _, _, m in cdc_chunks(shifted)}
    f1 = {m for _, _, _, m in fixed_chunks(data)}
    f2 = {m for _, _, _, m in fixed_chunks(shifted)}
    assert len(f1 & f2) == 0  # fixed-size: total loss
    assert len(c1 & c2) >= 0.8 * len(c1)  # CDC: resynchronized


def test_injected_corpus_pairs_share_chunks(spark):
    """End-to-end over the corpus variant: every two-span doc's second
    blob (header + first blob's bytes) must share the bulk of its CDC
    chunks with the first — the structure the registry query's
    duplicate groups are made of."""
    from ocr_gang_spark.synth import blob_for_cdc_ref, cdc_shift_source_ref

    checked = 0
    for did in (1, 3, 5, 7, 9):
        ref2 = f"m42-doc-{did:08d}-2"
        src = cdc_shift_source_ref(ref2)
        assert src == f"m42-doc-{did:08d}-1"
        b1 = blob_for_cdc_ref(src)
        b2 = blob_for_cdc_ref(ref2)
        assert b2[64:] == b1  # the injection shape
        c1 = {m for _, _, _, m in cdc_chunks(b1)}
        c2 = {m for _, _, _, m in cdc_chunks(b2)}
        # resync can cost at most the chunks touching the insertion
        # point — everything after the first common boundary matches
        # (small corpus blobs chunk into as few as 3 pieces, so the
        # bound is absolute, not a percentage)
        assert len(c1 & c2) >= max(1, len(c1) - 2), (did, len(c1 & c2), len(c1))
        checked += 1
    assert checked == 5
