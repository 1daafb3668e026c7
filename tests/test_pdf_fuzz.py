"""PDF parser fuzz: arbitrary truncations and byte corruptions of real
synth PDFs must TERMINATE (the ADVICE-r2 lone-'<' tokenizer wedge was
exactly this class) and either parse or raise a clean error — never an
unbounded loop, never a non-Error exception type.  Hypothesis drives
the offsets; a wall-clock guard converts any future wedge into a loud
failure instead of a hung executor."""

import signal

import pytest
from hypothesis import given, settings, strategies as st

from ocr_gang_spark.kernels.pdf import (
    _tokenize,
    extract_pdf_layout,
    synth_pdf_blob,
)

BLOBS = [synth_pdf_blob(f"pdf-fuzz-{i}") for i in range(4)]
PER_CASE_BUDGET_S = 5


class _Wedge(Exception):
    pass


def _must_terminate(blob: bytes) -> None:
    # hard SIGALRM bound: a post-hoc clock can't catch a true wedge
    # (the test would just hang with the executor)
    def _raise(_sig, _frm):
        raise _Wedge("parser wedged past the per-case budget")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(PER_CASE_BUDGET_S)
    try:
        extract_pdf_layout(blob)
    except _Wedge:
        raise AssertionError("parser wedged (unbounded loop)") from None
    except Exception as e:  # noqa: BLE001 — clean failure is acceptable
        assert isinstance(e, (ValueError, KeyError, IndexError, EOFError)), repr(e)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@settings(max_examples=120, deadline=None)
@given(st.integers(0, len(BLOBS) - 1), st.integers(0, 4096))
def test_truncation_terminates(idx, cut):
    blob = BLOBS[idx]
    _must_terminate(blob[: min(cut, len(blob))])


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, len(BLOBS) - 1),
    st.integers(0, 4095),
    st.integers(0, 255),
)
def test_byte_corruption_terminates(idx, pos, val):
    blob = bytearray(BLOBS[idx])
    blob[pos % len(blob)] = val
    _must_terminate(bytes(blob))


def test_trailing_lone_angle_bracket_regression():
    # the exact ADVICE-r2 wedge shape: a content stream ending in 0x3C
    for blob in BLOBS:
        _must_terminate(blob + b"<")
        list(_tokenize(b"BT (x) Tj <"))  # must not spin


def test_empty_and_garbage():
    _must_terminate(b"")
    _must_terminate(b"%PDF-1.4\n%%EOF")
    _must_terminate(b"\x00" * 512)
