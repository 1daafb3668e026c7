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


def _pdf_from_page_streams(streams: list) -> bytes:
    """Minimal well-formed PDF with one page per raw content stream —
    the synth_pdf_blob assembly (xref/trailer layout) with caller-
    chosen streams, so a test can plant a genuinely EMPTY page."""
    objs = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    contents = [
        add(b"<< /Length " + str(len(s)).encode() + b" >>\n"
            b"stream\n" + s + b"\nendstream")
        for s in streams
    ]
    pages_id = len(objs) + len(streams) + 1
    page_nums = [
        add(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_id, font, c))
        for c in contents
    ]
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    pages = add(b"<< /Type /Pages /Kids [ " + kids + b" ] /Count %d >>"
                % len(streams))
    assert pages == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, catalog, xref_at))
    return bytes(out)


def test_blank_page_keeps_formfeed_slot():
    """Round-4 review: a textless middle page collapsed out of the
    form-feed join, shifting later pages' indices.  ADVICE r4: the
    original regression test never exercised a blank page (every synth
    corpus page has text), so the fix is now pinned on a hand-built
    3-page PDF whose middle /Contents stream is EMPTY — the slot must
    survive as '' between the neighbors, not collapse."""
    from ocr_gang_spark.kernels.pdf import extract_pdf_text, synth_pdf_blob
    from ocr_gang_spark.media_queries import N_PDF  # noqa: F401 — env check

    blob = _pdf_from_page_streams([
        b"BT /F1 12 Tf 72 720 Td (first) Tj ET",
        b"",
        b"BT /F1 12 Tf 72 720 Td (last) Tj ET",
    ])
    assert extract_pdf_text(blob).split("\f") == ["first", "", "last"]

    # and the synth corpus path still keeps one slot per page
    base = extract_pdf_text(synth_pdf_blob("pdf-fuzz-blank"))
    n_pages = base.count("\f") + 1
    assert n_pages >= 1 and all(p for p in base.split("\f"))
