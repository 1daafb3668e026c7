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


def test_corrupt_operand_types_are_skipped_not_typeerror():
    """Round-4 review: non-numeric operands reaching Td/TD/Tm/TL raised
    TypeError (outside the module's clean-failure contract) or leaked
    raw bytes into the x coordinate.  Malformed operators are skipped."""
    from ocr_gang_spark.kernels.pdf import extract_page_lines

    assert extract_page_lines(b"1 (a) Td") == []
    assert extract_page_lines(b"(a) TL T* (x) Tj") == [(0.0, 0.0, "x")]
    out = extract_page_lines(b"1 2 3 4 (a) 5 Tm (x) Tj")
    assert out == [(0.0, 0.0, "x")]
    assert all(isinstance(x, float) for _x, _y, _t in out for x in (_x, _y))


def test_stray_array_close_does_not_duplicate_text():
    """Round-4 review: a stray ']' re-pushed the stale array, so a
    one-byte corruption re-showed already-rendered text."""
    from ocr_gang_spark.kernels.pdf import extract_page_lines

    assert extract_page_lines(b"BT [ (a) ] TJ ] TJ ET") == [(0.0, 0.0, "a")]


def test_blank_page_keeps_formfeed_slot():
    """Round-4 review: a textless middle page collapsed out of the
    form-feed join, shifting later pages' indices."""
    from ocr_gang_spark.kernels.pdf import extract_pdf_text, synth_pdf_blob
    from ocr_gang_spark.media_queries import N_PDF  # noqa: F401 — env check

    blob = synth_pdf_blob("pdf-fuzz-blank")
    base = extract_pdf_text(blob)
    n_pages = base.count("\f") + 1
    assert n_pages >= 1 and all(p for p in base.split("\f"))
