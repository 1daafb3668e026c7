"""WARC (ISO 28500 / WARC/1.0) reader + writer, stdlib-only.

Web-scale corpora arrive as WARC: concatenated records, each a version
line, named headers, a Content-Length-sized block, and a CRLF CRLF
trailer.  The reference pipeline (theolebever/OCR-GANG) reads loose
image files from a directory (`main.c`, `source/ocr/ocr.c`); at 10^12
documents the ingestion analog is WARC response records whose HTTP
payload carries the page — so this kernel is the S1/S2 source family
member for the archive format the extraction tier actually ingests.

Design rules (shared with kernels/pdf.py after its fuzz hardening):

* NEVER regex/scan over payload bytes on the happy path — the block is
  sized by Content-Length, so payloads containing ``WARC/1.0`` or
  header-looking bytes are skipped, not re-parsed.
* Malformed input degrades to a bounded resync scan for the next
  record boundary (``\\r\\n\\r\\nWARC/``) and a kind='error' record —
  a corrupt record never throws out of the parser and never wedges an
  executor: every loop iteration provably advances the cursor.
* Truncation at ANY byte offset yields the records fully contained in
  the prefix (plus at most one error record), pinned by the fuzz test
  (tests/test_warc.py) the same way the media decoders are.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

CRLF = b"\r\n"
# record boundary for resync after corruption: a blank line followed by
# a version line.  Both CRLF and bare-LF forms are matched — the parser
# deliberately tolerates LF-terminated records, so resyncing only on
# CRLF swallowed every remaining record of an LF archive after one
# corrupt stretch (round-4 review).
_RESYNCS = (b"\r\n\r\nWARC/", b"\n\nWARC/")


def _find_resync(blob: bytes, i: int) -> tuple:
    """(index of the next record boundary's 'WARC/' start, or -1)."""
    best = -1
    for pat in _RESYNCS:
        p = blob.find(pat, i)
        if p >= 0:
            cand = p + len(pat) - 5  # start of 'WARC/'
            if best < 0 or cand < best:
                best = cand
    return best


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def encode_http_response(
    status: int,
    reason: str,
    headers: List[Tuple[str, str]],
    body: bytes,
) -> bytes:
    """One HTTP/1.1 response block (the payload of a WARC response
    record).  Content-Length is always emitted so the reader can split
    head from body without scanning the body."""
    lines = [f"HTTP/1.1 {status} {reason}".encode("ascii")]
    lines += [f"{k}: {v}".encode("ascii") for k, v in headers]
    lines.append(b"Content-Length: %d" % len(body))
    return CRLF.join(lines) + CRLF + CRLF + body


def encode_warc_record(
    warc_type: str,
    headers: List[Tuple[str, str]],
    block: bytes,
) -> bytes:
    """One WARC/1.0 record: version line, headers (WARC-Type first,
    Content-Length computed last), blank line, block, CRLF CRLF."""
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode("ascii")]
    lines += [f"{k}: {v}".encode("ascii") for k, v in headers]
    lines.append(b"Content-Length: %d" % len(block))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def encode_warc_file(records: List[bytes], info_id: str = "synth") -> bytes:
    """A WARC file: a warcinfo record (software line, like real
    crawlers emit) followed by the given encoded records."""
    info_block = b"software: ocr-gang-spark-synth\r\nformat: WARC/1.0\r\n"
    info = encode_warc_record(
        "warcinfo",
        [("WARC-Record-ID", f"<urn:synth:{info_id}>"),
         ("Content-Type", "application/warc-fields")],
        info_block,
    )
    return info + b"".join(records)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _parse_headers(data: bytes, i: int, n: int) -> Tuple[Dict[str, str], int, bool]:
    """Parse ``Name: value`` lines from ``i`` until a blank line.
    Returns (headers, index past the blank line, well_formed).  Accepts
    bare-LF line endings (real crawl archives mix them in).  A line
    with no colon, or EOF before the blank line, ends parsing with
    well_formed=False — the cursor still lands past every consumed
    byte, so the caller always advances."""
    headers: Dict[str, str] = {}
    last_key: Optional[str] = None
    while i < n:
        eol = data.find(b"\n", i)
        if eol < 0:
            return headers, n, False
        line = data[i:eol].rstrip(b"\r")
        i = eol + 1
        if line == b"":
            return headers, i, True
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # obs-fold continuation (legal in the WARC/HTTP grammars;
            # real crawlers emit it) — append to the previous value
            # instead of failing the whole record on "no colon"
            # (round-4 review)
            headers[last_key] += " " + line.strip().decode("latin-1")
            continue
        colon = line.find(b":")
        if colon <= 0:
            return headers, i, False
        key = line[:colon].strip().decode("latin-1").lower()
        headers[key] = line[colon + 1:].strip().decode("latin-1")
        last_key = key
    return headers, n, False


def split_http_response(block: bytes) -> Tuple[int, Dict[str, str], bytes]:
    """(status, headers, body) from an HTTP response block.  Status -1
    if the status line is unparseable; body honors the HTTP
    Content-Length when present and sane, else everything past the
    head."""
    n = len(block)
    eol = block.find(b"\n")
    if eol < 0:
        return -1, {}, b""
    status_line = block[:eol].rstrip(b"\r")
    parts = status_line.split(None, 2)
    status = -1
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/" and parts[1].isdigit():
        status = int(parts[1])
    headers, i, _ok = _parse_headers(block, eol + 1, n)
    body = block[i:]
    cl = headers.get("content-length")
    if cl is not None and cl.isdigit() and int(cl) <= len(body):
        body = body[: int(cl)]
    return status, headers, body


def parse_warc(blob: bytes) -> List[dict]:
    """All records in a WARC blob, in file order.

    Each dict: ``warc_type`` (or 'error'), ``record_id``,
    ``target_uri``, ``warc_headers`` (lower-cased names), ``block``
    (raw bytes, b'' for errors), ``offset`` (byte offset of the
    record's version line — the per-record lineage key a 100 TB reader
    checkpoints on).  Corrupt stretches become one 'error' record
    covering the bytes skipped to the next resync point."""
    out: List[dict] = []
    n = len(blob)
    i = 0

    def error(at: int, upto: int, why: str) -> int:
        out.append({
            "warc_type": "error", "record_id": None, "target_uri": None,
            "warc_headers": {"error": why}, "block": b"", "offset": at,
        })
        return upto

    while i < n:
        if blob[i:i + 5] != b"WARC/":
            # resync: the only scan over unstructured bytes, entered
            # only on malformed input; always advances past i
            nxt = _find_resync(blob, i)
            i = error(i, n if nxt < 0 else nxt, "garbage before record")
            continue
        rec_start = i
        eol = blob.find(b"\n", i)
        if eol < 0:
            i = error(rec_start, n, "truncated version line")
            continue
        version = blob[i:eol].rstrip(b"\r").decode("latin-1", "replace")
        headers, i, ok = _parse_headers(blob, eol + 1, n)
        cl = headers.get("content-length")
        if not ok or cl is None or not cl.isdigit():
            nxt = _find_resync(blob, i)
            i = error(rec_start, n if nxt < 0 else nxt,
                      f"bad headers in {version}")
            continue
        length = int(cl)
        if i + length > n:
            i = error(rec_start, n, "block truncated")
            continue
        block = blob[i:i + length]
        i += length
        # trailer: exactly CRLF CRLF per spec; tolerate LF LF
        for _ in range(2):
            if blob[i:i + 2] == CRLF:
                i += 2
            elif blob[i:i + 1] == b"\n":
                i += 1
        out.append({
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_headers": headers,
            "block": block,
            "offset": rec_start,
        })
    return out


def parse_warc_responses(blob: bytes) -> List[dict]:
    """Response records only, with the HTTP payload split out:
    ``target_uri``, ``http_status``, ``http_headers``, ``body``,
    ``offset``.  The shape the extraction pipeline consumes."""
    out = []
    for rec in parse_warc(blob):
        if rec["warc_type"] != "response":
            continue
        status, hh, body = split_http_response(rec["block"])
        out.append({
            "target_uri": rec["target_uri"], "http_status": status,
            "http_headers": hh, "body": body, "offset": rec["offset"],
        })
    return out
