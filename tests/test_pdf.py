"""PDF kernel tests: tokenizer edge cases, layout spec pins, page-tree
order, stream decoding, and synth round-trip determinism."""

import zlib

import pytest

from ocr_gang_spark.kernels.pdf import (
    _page_order,
    _scan_objects,
    _stream_data,
    extract_page_lines,
    extract_pdf_layout,
    extract_pdf_text,
    synth_pdf_blob,
)


def lines_text(content: bytes):
    return [t for _x, _y, t in extract_page_lines(content)]


class TestContentStream:
    def test_tj_simple(self):
        assert lines_text(b"BT (hello) Tj ET") == ["hello"]

    def test_td_newline_only_on_vertical_move(self):
        c = b"BT 72 720 Td (a) Tj 10 0 Td (b) Tj 0 -14 Td (c) Tj ET"
        assert lines_text(c) == ["ab", "c"]

    def test_td_origin_tracks_horizontal_moves(self):
        c = b"BT 72 720 Td 10 0 Td (a) Tj ET"
        assert extract_page_lines(c) == [(82.0, 720.0, "a")]

    def test_tstar_uses_tl_leading(self):
        c = b"BT 14 TL 72 720 Td (a) Tj T* (b) Tj ET"
        assert extract_page_lines(c) == [(72.0, 720.0, "a"), (72.0, 706.0, "b")]

    def test_TD_sets_leading(self):
        # TD ty=-20 sets TL=20, so the following T* drops by 20
        c = b"BT 72 720 Td (a) Tj 0 -20 TD (b) Tj T* (c) Tj ET"
        assert extract_page_lines(c) == [
            (72.0, 720.0, "a"),
            (72.0, 700.0, "b"),
            (72.0, 680.0, "c"),
        ]

    def test_tm_newline_on_y_change(self):
        c = b"BT 1 0 0 1 72 720 Tm (a) Tj 1 0 0 1 300 720 Tm (b) Tj 1 0 0 1 72 700 Tm (c) Tj ET"
        assert lines_text(c) == ["ab", "c"]

    def test_quote_implies_newline(self):
        c = b"BT 14 TL 72 720 Td (a) Tj (b) ' ET"
        assert extract_page_lines(c) == [(72.0, 720.0, "a"), (72.0, 706.0, "b")]

    def test_tj_array_space_threshold(self):
        # gap wider than 180/1000 em = word break; narrower = joined
        c = b"BT [ (foo) -250 (bar) ] TJ ET"
        assert lines_text(c) == ["foo bar"]
        c = b"BT [ (foo) -100 (bar) ] TJ ET"
        assert lines_text(c) == ["foobar"]

    def test_tj_leading_number_no_leading_space(self):
        assert lines_text(b"BT [ -400 (x) ] TJ ET") == ["x"]

    def test_string_escapes(self):
        c = rb"BT (a\(b\)c\\d\164e) Tj ET"  # \164 octal = 't'
        assert lines_text(c) == ["a(b)c\\dte"]

    def test_string_nested_parens_balanced(self):
        assert lines_text(b"BT (a(b)c) Tj ET") == ["a(b)c"]

    def test_line_continuation_backslash_eol(self):
        assert lines_text(b"BT (ab\\\ncd) Tj ET") == ["abcd"]

    def test_hex_string_odd_padded(self):
        # '48 49 4' -> pads to 0x48 0x49 0x40 = 'HI@'
        assert lines_text(b"BT <48494> Tj ET") == ["HI@"]

    def test_comment_and_inline_dict_skipped(self):
        c = b"BT % a comment (not text)\n/Span << /MCID 0 >> BDC (x) Tj EMC ET"
        assert lines_text(c) == ["x"]

    def test_empty_and_whitespace_lines_dropped(self):
        assert lines_text(b"BT ( ) Tj T* () Tj ET") == []

    def test_trailing_lone_lt_terminates(self):
        # a blob truncated on a lone '<' used to wedge the tokenizer in
        # the inline-dict branch (scan loop makes no progress at n-1)
        assert lines_text(b"BT (x) Tj ET <") == ["x"]
        assert lines_text(b"<") == []
        assert lines_text(b"BT (x) Tj <<") == ["x"]

    def test_unterminated_inline_dict_terminates(self):
        assert lines_text(b"BT (x) Tj << /MCID 0") == ["x"]


class TestObjects:
    def _min_pdf(self, contents: bytes, flate: bool = False,
                 indirect_len: bool = False) -> bytes:
        data = zlib.compress(contents) if flate else contents
        filt = b"/Filter /FlateDecode " if flate else b""
        objs = []
        if indirect_len:
            objs.append(b"<< " + filt + b"/Length 5 0 R >>\nstream\n" + data
                        + b"\nendstream")
        else:
            objs.append(b"<< " + filt + b"/Length " + str(len(data)).encode()
                        + b" >>\nstream\n" + data + b"\nendstream")
        objs.append(b"<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>")
        objs.append(b"<< /Type /Pages /Kids [ 2 0 R ] /Count 1 >>")
        objs.append(b"<< /Type /Catalog /Pages 3 0 R >>")
        if indirect_len:
            objs.append(str(len(data)).encode())
        out = bytearray(b"%PDF-1.4\n")
        for i, body in enumerate(objs, start=1):
            out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        out += b"trailer\n<< /Root 4 0 R >>\n%%EOF\n"
        return bytes(out)

    def test_plain_stream(self):
        blob = self._min_pdf(b"BT (plain) Tj ET")
        assert extract_pdf_text(blob) == "plain"

    def test_flate_stream(self):
        blob = self._min_pdf(b"BT (inflated) Tj ET", flate=True)
        assert extract_pdf_text(blob) == "inflated"

    def test_indirect_length(self):
        blob = self._min_pdf(b"BT (indirect) Tj ET", indirect_len=True)
        assert extract_pdf_text(blob) == "indirect"

    def test_broken_length_falls_back_to_endstream(self):
        blob = self._min_pdf(b"BT (fallback) Tj ET").replace(
            b"/Length 16", b"/Length 99999"
        )
        assert extract_pdf_text(blob) == "fallback"

    def test_stream_payload_endobj_does_not_truncate_object(self):
        # stream bytes routinely contain 'endobj' / 'N G obj' sequences
        # once compressed; the scanner must size the payload by /Length,
        # not by the first apparent keyword inside it
        content = b"BT (endobj 9 0 obj endstreamish) Tj ET"
        blob = self._min_pdf(content)
        assert extract_pdf_text(blob) == "endobj 9 0 obj endstreamish"

    def test_stream_payload_obj_header_mints_no_phantom(self):
        blob = self._min_pdf(b"BT (see 9 0 obj <<>> endobj here) Tj ET")
        objs = _scan_objects(blob)
        assert 9 not in objs
        assert set(objs) == {1, 2, 3, 4}

    def test_stream_word_in_string_literal_swallows_nothing(self):
        # 'stream\n' inside a non-stream object's string literal must
        # not trigger the payload scan (which would consume every
        # object up to someone else's endstream)
        blob = (
            b"%PDF-1.4\n"
            b"1 0 obj (text with the word stream\nin it) endobj\n"
            b"2 0 obj << /Type /Page >> endobj\n"
            b"3 0 obj << /Length 5 >> stream\nHELLO\nendstream endobj\n"
        )
        objs = _scan_objects(blob)
        assert set(objs) == {1, 2, 3}
        assert b"/Type /Page" in objs[2]
        assert b"HELLO" in objs[3]

    def test_any_truncation_terminates(self):
        # the module's robustness claim is real-corpus truncated blobs;
        # ADVICE r2 found a lone trailing '<' wedging the tokenizer, so
        # pin the whole class: EVERY prefix truncation of a real blob
        # must terminate (return or raise), never hang.  signal.alarm
        # guards against regression-to-infinite-loop.
        import signal

        from ocr_gang_spark.kernels.pdf import synth_pdf_blob

        blob = synth_pdf_blob("pdf-007")

        def on_alarm(*_a):  # pragma: no cover
            raise TimeoutError("truncated-blob parse hung")

        old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(60)
        try:
            for k in range(0, len(blob), 7):
                try:
                    extract_pdf_text(blob[:k])
                except Exception:
                    pass  # clean raise is fine; hanging is not
            # and every suffix ending exactly at a '<' byte
            for k in [i + 1 for i, b in enumerate(blob) if b == 0x3C][:50]:
                try:
                    extract_pdf_text(blob[:k])
                except Exception:
                    pass
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def test_page_order_follows_kids_not_object_number(self):
        # two pages listed in reverse object order in /Kids
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [ 4 0 R 3 0 R ] /Count 2 >>",
            3: b"<< /Type /Page >>",
            4: b"<< /Type /Page >>",
        }
        assert _page_order(objs) == [4, 3]

    def test_nested_pages_tree(self):
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [ 3 0 R 6 0 R ] /Count 3 >>",
            3: b"<< /Type /Pages /Kids [ 4 0 R 5 0 R ] /Count 2 >>",
            4: b"<< /Type /Page >>",
            5: b"<< /Type /Page >>",
            6: b"<< /Type /Page >>",
        }
        assert _page_order(objs) == [4, 5, 6]

    def test_no_catalog_falls_back_to_page_scan(self):
        objs = {
            7: b"<< /Type /Page >>",
            3: b"<< /Type /Page >>",
            5: b"<< /Type /Pages /Kids [] >>",
        }
        assert _page_order(objs) == [3, 7]

    def test_later_duplicate_object_wins(self):
        blob = self._min_pdf(b"BT (old) Tj ET")
        extra = b"1 0 obj\n<< /Length 14 >>\nstream\nBT (new) Tj ET\nendstream\nendobj\n"
        blob = blob.replace(b"trailer", extra + b"trailer")
        assert extract_pdf_text(blob) == "new"

    def test_stream_data_none_without_stream(self):
        assert _stream_data(b"<< /Type /Page >>", {}) is None


class TestSynthRoundTrip:
    def test_deterministic(self):
        assert synth_pdf_blob("pdf-007") == synth_pdf_blob("pdf-007")
        assert synth_pdf_blob("pdf-007") != synth_pdf_blob("pdf-008")

    def test_magic_and_trailer(self):
        blob = synth_pdf_blob("pdf-000")
        assert blob.startswith(b"%PDF-1.4\n")
        assert blob.rstrip().endswith(b"%%EOF")

    @pytest.mark.parametrize("i", range(12))
    def test_every_ref_extracts_nonempty_ordered(self, i):
        rows = extract_pdf_layout(synth_pdf_blob(f"pdf-{i:03d}"))
        assert rows, "every synth PDF must yield text"
        # pages and line numbers are contiguous from 0; y strictly
        # decreases down each page (the synth corpus is reading-ordered)
        pages = sorted({r[0] for r in rows})
        assert pages == list(range(len(pages)))
        for p in pages:
            page_rows = [r for r in rows if r[0] == p]
            assert [r[1] for r in page_rows] == list(range(len(page_rows)))
            ys = [r[3] for r in page_rows]
            assert ys == sorted(ys, reverse=True)
            for _pg, _ln, x, _y, text in page_rows:
                assert x == 72.0
                assert text == text.strip() and text

    def test_words_from_known_vocabulary(self):
        from ocr_gang_spark.kernels.pdf import _WORDS

        for _pg, _ln, _x, _y, text in extract_pdf_layout(synth_pdf_blob("pdf-001")):
            assert all(w in _WORDS for w in text.split())

    def test_xref_offsets_point_at_objects(self):
        blob = synth_pdf_blob("pdf-002")
        xref_at = int(blob.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
        assert blob[xref_at : xref_at + 4] == b"xref"
        table = blob[xref_at:].split(b"trailer")[0].splitlines()[2:]
        for i, entry in enumerate(l for l in table if l.endswith(b"n ")):
            off = int(entry.split()[0])
            assert blob[off:].startswith(b"%d 0 obj" % (i + 1))
