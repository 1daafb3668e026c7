"""WARC reader/writer: round-trip exactness, truncation-prefix
recovery, corruption resync, and the anti-wedge budget the other blob
kernels carry (one wedged record would pin an executor core at
10^12-document scale).  parse_warc must NEVER raise — malformed input
degrades to kind='error' records with the cursor provably advancing."""

import signal

from hypothesis import given, settings, strategies as st

from ocr_gang_spark.kernels.warc import (
    encode_http_response,
    encode_warc_file,
    encode_warc_record,
    parse_warc,
    parse_warc_responses,
    split_http_response,
)

BUDGET_S = 5


def _record(i: int, body: bytes) -> bytes:
    http = encode_http_response(
        200 + i, "OK",
        [("Content-Type", "text/html"), ("X-Content-Lang", "en")],
        body,
    )
    return encode_warc_record(
        "response",
        [("WARC-Record-ID", f"<urn:t:{i}>"),
         ("WARC-Target-URI", f"https://h/{i}"),
         ("WARC-Date", "2026-01-01T00:00:00Z")],
        http,
    )


# bodies deliberately contain the parser's own magic strings — the
# Content-Length-sized block read must never re-scan payload bytes
BODIES = [
    b"plain body",
    b"bait WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\nxxxx",
    b"\r\n\r\nWARC/ resync bait " * 3,
    b"",
    bytes(range(256)),
]
FILE = encode_warc_file([_record(i, b) for i, b in enumerate(BODIES)], "t")


class _Wedge(Exception):
    pass


def _bounded_parse(blob: bytes):
    def _raise(_s, _f):
        raise _Wedge()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(BUDGET_S)
    try:
        return parse_warc(blob)
    except _Wedge:
        raise AssertionError("parse_warc wedged (unbounded loop)") from None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_round_trip_exact():
    recs = parse_warc(FILE)
    assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 5
    resp = parse_warc_responses(FILE)
    assert [r["body"] for r in resp] == BODIES  # payload bytes EXACT
    assert [r["http_status"] for r in resp] == [200, 201, 202, 203, 204]
    assert [r["target_uri"] for r in resp] == [f"https://h/{i}" for i in range(5)]
    assert all(r["http_headers"]["x-content-lang"] == "en" for r in resp)
    # offsets are the lineage key: strictly increasing, version line at each
    offs = [r["offset"] for r in recs]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert all(FILE[o:o + 5] == b"WARC/" for o in offs)


def test_truncation_yields_contained_prefix():
    """Cut at EVERY byte: the records fully contained in the prefix are
    recovered exactly; at most one trailing error record; no raise."""
    full = parse_warc_responses(FILE)
    ends = {}  # target_uri -> byte offset just past its trailer
    recs = parse_warc(FILE)
    for i, r in enumerate(recs):
        nxt = recs[i + 1]["offset"] if i + 1 < len(recs) else len(FILE)
        ends[r["target_uri"]] = nxt
    for cut in range(len(FILE) + 1):
        got = _bounded_parse(FILE[:cut])
        errors = [r for r in got if r["warc_type"] == "error"]
        assert len(errors) <= 1
        ok = [r for r in got if r["warc_type"] == "response"]
        want = [r for r in full if ends[r["target_uri"]] <= cut]
        assert [r["target_uri"] for r in ok][: len(want)] == [
            r["target_uri"] for r in want
        ]


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 1 << 20), st.integers(0, 255))
def test_byte_corruption_terminates_and_resyncs(pos, val):
    blob = bytearray(FILE)
    blob[pos % len(blob)] = val
    got = _bounded_parse(bytes(blob))
    # a single flipped byte can kill at most a bounded neighborhood of
    # records; the resync must recover at least 3 of the 6
    assert sum(r["warc_type"] != "error" for r in got) >= 3


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_arbitrary_bytes_never_raise(blob):
    got = _bounded_parse(blob)
    # progress invariant: record count is bounded by input size
    assert len(got) <= len(blob) + 1


def test_garbage_between_records_is_one_error_record():
    """A garbage splice costs exactly one error record plus AT MOST the
    record it glued itself onto (the conservative resync — requiring a
    CRLF CRLF boundary before the version line — never fabricates
    records out of payload bait, at the price of the one adjacent
    record).  Everything beyond the next boundary survives exactly."""
    recs0 = parse_warc(FILE)
    at = recs0[2]["offset"]  # splice garbage before record 2 (h/1)
    blob = FILE[:at] + b"\x00\xffnoise, no version line" + FILE[at:]
    got = parse_warc(blob)
    kinds = [r["warc_type"] for r in got]
    assert kinds.count("error") == 1
    uris = [r["target_uri"] for r in got if r["warc_type"] == "response"]
    assert uris == ["https://h/0", "https://h/2", "https://h/3", "https://h/4"]


def test_http_split_honors_content_length_and_tolerates_junk():
    s, h, b = split_http_response(b"HTTP/1.1 404 Not Found\r\nA: 1\r\n\r\nbody")
    assert (s, h["a"], b) == (404, "1", b"body")
    s, _h, b = split_http_response(b"not http at all")
    assert s == -1
    # bare-LF line endings (real archives mix them in)
    s, h, b = split_http_response(b"HTTP/1.1 200 OK\nX: y\n\npayload")
    assert (s, h["x"], b) == (200, "y", b"payload")


def test_row_builder_tolerates_unattributable_records(spark):
    """warc_records_from must not die on records whose URI has no
    numeric doc tail or whose body is not valid UTF-8 — one malformed
    record in a real archive must not take down the batch (the
    code-review bug was a bare int(uri tail) / strict decode)."""
    from ocr_gang_spark.extraction_queries import warc_records_from

    http = encode_http_response(
        200, "OK", [("Content-Type", "text/html")], b"\xff\xfe raw bytes"
    )
    rec = encode_warc_record(
        "response",
        [("WARC-Record-ID", "<urn:t:x>"),
         ("WARC-Target-URI", "https://example.com/index.html")],
        http,
    )
    blob = encode_warc_file([rec, _record(7, b"fine")], "t")
    df = spark.createDataFrame([(0, bytearray(blob))],
                               "file_id bigint, blob binary")
    rows = {r.target_uri: r for r in warc_records_from(df).collect()}
    assert rows["https://example.com/index.html"].doc_id == -1
    assert rows["https://h/7"].doc_id == 7  # healthy record unaffected


def test_lf_archive_resyncs_after_garbage():
    """Round-4 review: resync only matched CRLF boundaries, so one
    corrupt stretch in a bare-LF archive swallowed every remaining
    record.  Both line-ending conventions must recover."""
    def rec(body, crlf):
        nl = b"\r\n" if crlf else b"\n"
        h = (b"WARC/1.0" + nl
             + b"WARC-Type: response" + nl
             + b"WARC-Record-ID: <urn:x:1>" + nl
             + b"Content-Length: " + str(len(body)).encode() + nl + nl)
        return h + body + nl + nl

    for crlf in (True, False):
        nl = b"\r\n" if crlf else b"\n"
        blob = b"garbage" + nl + nl + rec(b"aa", crlf) + rec(b"bb", crlf)
        types = [r["warc_type"] for r in parse_warc(blob)]
        assert types.count("response") == 2, (crlf, types)


def test_folded_header_lines_parse_as_continuations():
    """Round-4 review: obs-fold continuations (leading whitespace) have
    no colon and failed the whole record; they must append to the
    previous header's value."""
    from ocr_gang_spark.kernels.warc import _parse_headers

    h, _i, ok = _parse_headers(b"A: one\n  two\nB: x\n\n", 0, 19)
    assert ok and h["a"] == "one two" and h["b"] == "x"
