"""Media decoder fuzz: random truncations/corruptions of every blob
format must TERMINATE quickly.  The quarantine kernel catches any
exception type (decode_quarantine_stats), so the contract here is
purely anti-wedge: no unbounded loop, no >5 s pathological case —
one wedged blob would pin an executor core at 10^12-blob scale."""

import signal

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ocr_gang_spark.kernels.bmp import decode_media_blob
from ocr_gang_spark.kernels.media_meta import (
    decode_wav,
    sample_frames,
    sniff_media_meta,
    synth_audio_blob,
    synth_video_blob,
)
from ocr_gang_spark.synth import blob_for_ref

BLOBS = [
    blob_for_ref("m42-doc-00000000-1"),   # zlib-BMP
    blob_for_ref("m42-doc-00000004-1"),   # (format per ref hash)
    blob_for_ref("m42-doc-00000007-2"),
    blob_for_ref("m42-doc-00000013-1"),
    synth_audio_blob("aud-000"),
    synth_video_blob("vid-000"),
]
BUDGET_S = 5


class _Wedge(Exception):
    pass


def _bounded(fn, blob):
    def _raise(_s, _f):
        raise _Wedge()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(BUDGET_S)
    try:
        fn(blob)
    except _Wedge:
        raise AssertionError(f"{fn.__name__} wedged (unbounded loop)") from None
    except Exception:  # noqa: BLE001 — quarantine contract: any clean raise
        pass
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _all_decoders(blob):
    _bounded(decode_media_blob, blob)
    _bounded(sniff_media_meta, blob)
    _bounded(decode_wav, blob)
    _bounded(lambda b: list(sample_frames(b, stride=2)), blob)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, len(BLOBS) - 1), st.integers(0, 8192))
def test_truncation_terminates(idx, cut):
    blob = BLOBS[idx]
    _all_decoders(blob[: min(cut, len(blob))])


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, len(BLOBS) - 1),
    st.integers(0, 8191),
    st.integers(0, 255),
)
def test_byte_corruption_terminates(idx, pos, val):
    blob = bytearray(BLOBS[idx])
    blob[pos % len(blob)] = val
    _all_decoders(bytes(blob))


def test_healthy_blobs_still_decode():
    assert isinstance(decode_media_blob(BLOBS[0]), np.ndarray)
    assert decode_wav(BLOBS[4])[1].size > 0
    assert len(list(sample_frames(BLOBS[5], stride=2))) > 0
