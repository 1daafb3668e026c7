"""Pure-stdlib PDF text + layout extraction kernel.

The north rule names "PDF/layout parse" as a first-class capability of
the extraction pipeline alongside HTML boilerplate stripping (the
reference engine itself is image-only — `IMG_Load` at
/root/reference/source/sdl/our_sdl.c:20-31 — so, like html_strip, this
module is **our own pinned spec**, frozen by golden tests and a
committed expected-output fixture).  No codec libraries exist in the
sandbox; the parser is stdlib `zlib` + `re` over the PDF 1.4 subset a
text-extraction pass actually touches:

* object scan          — every ``N G obj ... endobj`` body is indexed by
                         object number; the xref table is *not* trusted
                         (real-world PDFs routinely ship broken xrefs;
                         a full scan is also the robust choice for a
                         distributed extractor that sees truncated
                         blobs).
* page tree walk       — /Type /Catalog → /Pages → depth-first /Kids
                         order defines page order (PDF 32000-1:2008
                         §7.7.3.2).
* content streams      — /Contents ref or array of refs, concatenated
                         with a newline; /Filter /FlateDecode inflated
                         with stdlib zlib (§7.4.4); /Length may be an
                         indirect reference.
* text operators       — BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, ', "
                         (§9.4.2-9.4.3) with literal-string escapes
                         (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd, §7.3.4.2)
                         and hex strings.

Pinned layout spec (what "layout parse" means here, deterministically):
  * a LINE break happens on T*, on ' / " (which imply T*), on Td/TD
    with ty != 0, and on Tm whose translation y differs from the
    current y;
  * within a TJ array, a numeric adjustment < -TJ_SPACE_GAP (180
    thousandths of an em) renders as a single space — the standard
    word-gap heuristic, pinned at one threshold;
  * each emitted line row carries the text-space (x, y) of its first
    glyph run, so downstream operators can re-order or cluster by
    geometry (the synth corpus is already in reading order).

Strings decode as Latin-1 (PDFDocEncoding agrees with it over the
printable range; the synth corpus is ASCII).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

TJ_SPACE_GAP = 180.0  # thousandths of an em; gap wider than this = word break

# --------------------------------------------------------------------------
# object-level parsing
# --------------------------------------------------------------------------

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"^\s*(\d+)\s+\d+\s+R", re.DOTALL)


def _scan_objects(blob: bytes) -> Dict[int, bytes]:
    """Index every indirect object body by object number (xref ignored —
    see module docstring).  Later duplicates win, matching incremental-
    update semantics where the newest revision appends overriding
    objects.

    Stream-aware single forward pass: for objects that carry a stream,
    the payload is sized by the resolved /Length (falling back to the
    next 'endstream' keyword), so FlateDecode bytes that happen to
    contain 'endobj' cannot truncate the object and 'N G obj' byte
    sequences inside the payload cannot mint phantom objects — consumed
    payload bytes are never re-scanned.  Indirect /Length refs resolve
    against the objects seen so far (writers emit the length object
    before the stream that uses it; a forward ref just falls back to
    the endstream scan)."""
    objs: Dict[int, bytes] = {}
    n = len(blob)
    pos = 0
    while pos < n:
        m = _OBJ_HDR_RE.search(blob, pos)
        if m is None:
            break
        body_start = m.end()
        eo = blob.find(b"endobj", body_start)
        # the stream keyword is only legitimate immediately after the
        # object's dictionary (PDF 32000 7.3.8: "dictionary ...
        # stream"), so require ...>> [ws] stream — a 'stream' byte
        # sequence inside a string literal or other body content must
        # NOT trigger the payload scan (it would swallow every object
        # up to someone else's 'endstream')
        sm = None
        for cand in _STREAM_RE.finditer(blob, body_start, eo if eo >= 0 else n):
            if blob[body_start:cand.start()].rstrip().endswith(b">>"):
                sm = cand
                break
        if sm is not None:
            data_start = sm.end()
            head = _dict_body(blob[body_start : sm.start()])
            length = _resolve_int(_dict_value(head, b"Length"), objs)
            es = -1
            if length is not None and data_start + length <= n:
                es = blob.find(b"endstream", data_start + length)
            if es < 0:
                es = blob.find(b"endstream", data_start)
            tail = es + len(b"endstream") if es >= 0 else data_start
            eo = blob.find(b"endobj", tail)
        body_end = eo if eo >= 0 else n
        objs[int(m.group(1))] = blob[body_start:body_end]
        pos = body_end + len(b"endobj") if eo >= 0 else n
    return objs


def _dict_body(obj: bytes) -> bytes:
    """The top-level << ... >> dictionary of an object body (balanced)."""
    start = obj.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i < len(obj) - 1:
        pair = obj[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return obj[start:i]
        else:
            i += 1
    return obj[start:]


def _dict_value(d: bytes, key: bytes) -> Optional[bytes]:
    """Raw token(s) following /key in a dict body: an indirect ref, a
    number, a name, or a balanced [...] array."""
    m = re.search(rb"/" + key + rb"(?![A-Za-z0-9])\s*", d)
    if not m:
        return None
    rest = d[m.end():]
    if rest[:1] == b"[":
        depth = 0
        for i, ch in enumerate(rest):
            if ch == 0x5B:
                depth += 1
            elif ch == 0x5D:
                depth -= 1
                if depth == 0:
                    return rest[: i + 1]
        return rest
    m2 = re.match(rb"(\d+\s+\d+\s+R|/[^\s/<>\[\]()]+|-?[\d.]+)", rest)
    return m2.group(1) if m2 else None


def _resolve_int(val: Optional[bytes], objs: Dict[int, bytes]) -> Optional[int]:
    if val is None:
        return None
    ref = _REF_RE.match(val)
    if ref:
        body = objs.get(int(ref.group(1)), b"")
        m = re.search(rb"-?\d+", body)
        return int(m.group(0)) if m else None
    try:
        return int(val)
    except ValueError:
        return None


def _stream_data(obj: bytes, objs: Dict[int, bytes]) -> Optional[bytes]:
    """Decoded stream bytes of an object (None if it has no stream)."""
    m = _STREAM_RE.search(obj)
    if not m:
        return None
    d = _dict_body(obj)
    length = _resolve_int(_dict_value(d, b"Length"), objs)
    data = obj[m.end():]
    if length is not None and length <= len(data):
        data = data[:length]
    else:  # damaged /Length — fall back to the endstream keyword
        end = data.rfind(b"endstream")
        if end >= 0:
            data = data[:end].rstrip(b"\r\n")
    filt = _dict_value(d, b"Filter")
    if filt and b"FlateDecode" in filt:
        try:
            data = zlib.decompress(data)
        except zlib.error as e:
            # corrupt/truncated Flate payload: normalize to the module's
            # clean-failure contract (a raw zlib.error escaping an
            # executor task is an unexpected exception type for the
            # quarantine routing; tests/test_pdf_fuzz.py pins this)
            raise ValueError(f"undecodable FlateDecode stream: {e}") from e
    return data


def _page_order(objs: Dict[int, bytes]) -> List[int]:
    """Ordered leaf-page object numbers via the /Catalog → /Pages →
    /Kids depth-first walk."""
    root = None
    for num, body in objs.items():
        if re.search(rb"/Type\s*/Catalog\b", body):
            pages = _dict_value(_dict_body(body), b"Pages")
            ref = _REF_RE.match(pages) if pages else None
            if ref:
                root = int(ref.group(1))
                break
    if root is None:
        # no catalog (truncated blob): every /Type /Page in number order
        return sorted(
            n for n, b in objs.items() if re.search(rb"/Type\s*/Page\b(?!s)", b)
        )
    order: List[int] = []
    seen = set()

    def walk(num: int) -> None:
        if num in seen:
            return
        seen.add(num)
        body = objs.get(num, b"")
        d = _dict_body(body)
        if re.search(rb"/Type\s*/Pages\b", d):
            kids = _dict_value(d, b"Kids") or b""
            for m in re.finditer(rb"(\d+)\s+\d+\s+R", kids):
                walk(int(m.group(1)))
        elif re.search(rb"/Type\s*/Page\b", d):
            order.append(num)

    walk(root)
    return order


def _page_content(num: int, objs: Dict[int, bytes]) -> bytes:
    body = objs.get(num, b"")
    contents = _dict_value(_dict_body(body), b"Contents")
    if not contents:
        return b""
    parts = []
    for m in re.finditer(rb"(\d+)\s+\d+\s+R", contents):
        data = _stream_data(objs.get(int(m.group(1)), b""), objs)
        if data:
            parts.append(data)
    return b"\n".join(parts)


# --------------------------------------------------------------------------
# content-stream tokenizer (§7.2) — strings, hex strings, numbers, names,
# array brackets, operators
# --------------------------------------------------------------------------

_ESCAPES = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
    0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _tokenize(data: bytes):
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = i
            while j < n and data[j] not in b"\r\n":
                j += 1
            i = j
        elif c == 0x28:  # ( literal string, balanced, with escapes
            i += 1
            depth = 1
            out = bytearray()
            while i < n and depth:
                c = data[i]
                if c == 0x5C and i + 1 < n:
                    nxt = data[i + 1]
                    if nxt in _ESCAPES:
                        out += _ESCAPES[nxt]
                        i += 2
                    elif 0x30 <= nxt <= 0x37:  # \ddd octal, up to 3 digits
                        j = i + 1
                        oct_digits = bytearray()
                        while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                            oct_digits.append(data[j])
                            j += 1
                        out.append(int(oct_digits.decode(), 8) & 0xFF)
                        i = j
                    elif nxt in b"\r\n":  # line continuation
                        i += 2
                        if nxt == 0x0D and i < n and data[i] == 0x0A:
                            i += 1
                    else:
                        out.append(nxt)
                        i += 2
                else:
                    if c == 0x28:
                        depth += 1
                    elif c == 0x29:
                        depth -= 1
                        if not depth:
                            i += 1
                            break
                    out.append(c)
                    i += 1
            yield ("str", bytes(out))
        elif c == 0x3C and i + 1 < n and data[i + 1] != 0x3C:  # <hex>
            j = data.find(b">", i)
            j = n if j < 0 else j
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode()))
            i = j + 1
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and data[j] not in b" \t\r\n\x00\x0c()<>[]{}/%":
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
        elif c in b"[]":
            yield ("arr", data[i : i + 1])
            i += 1
        elif c == 0x3C:  # << inline dict — skip balanced (BDC/DP props)
            depth = 0
            j = i
            while j < n - 1:
                if data[j : j + 2] == b"<<":
                    depth += 1
                    j += 2
                elif data[j : j + 2] == b">>":
                    depth -= 1
                    j += 2
                    if not depth:
                        break
                else:
                    j += 1
            # A lone trailing '<' (blob truncated mid-token) enters this
            # branch with j == i and the scan loop never running; force
            # progress so a wedged byte can't spin an executor task forever.
            i = max(j, i + 1)
        elif (0x30 <= c <= 0x39) or c in b"+-.":
            j = i + 1
            while j < n and ((0x30 <= data[j] <= 0x39) or data[j] in b"."):
                j += 1
            yield ("num", float(data[i:j]))
            i = j
        else:  # operator keyword
            j = i
            while j < n and data[j] not in b" \t\r\n\x00\x0c()<>[]{}/%":
                j += 1
            if j > i:
                yield ("op", data[i:j])
            # stray delimiter bytes ()}{> land here with j == i (binary
            # garbage reaching the tokenizer, e.g. a corrupt /Filter
            # name leaving a Flate payload undecoded): force progress —
            # an empty-op spin is the same executor-wedge class as the
            # lone-'<' bug (tests/test_pdf_fuzz.py pins both)
            i = max(j, i + 1)


# --------------------------------------------------------------------------
# text extraction with the pinned layout spec
# --------------------------------------------------------------------------


def extract_page_lines(content: bytes) -> List[Tuple[float, float, str]]:
    """Lines of one page's content stream: (x, y, text) per line, in
    stream order, per the pinned layout spec in the module docstring."""
    lines: List[Tuple[float, float, str]] = []
    buf: List[str] = []
    x = y = 0.0          # current text-line origin (text space)
    bx = by = 0.0        # origin of the line being buffered
    leading = 0.0        # TL
    stack: List = []     # operand accumulator
    in_array: List = []
    array_mode = False

    def flush() -> None:
        if buf:
            text = "".join(buf).strip()
            if text:
                lines.append((bx, by, text))
            buf.clear()

    def newline(nx: float, ny: float) -> None:
        nonlocal bx, by
        flush()
        bx, by = nx, ny

    def show(raw: bytes) -> None:
        if not buf:
            nonlocal bx, by
            bx, by = x, y
        buf.append(raw.decode("latin-1"))

    for kind, val in _tokenize(content):
        if kind == "arr":
            if val == b"[":
                array_mode, in_array = True, []
            elif array_mode:
                array_mode = False
                stack.append(in_array)
                in_array = []
            # stray ']' outside an open array: ignore — re-pushing the
            # stale list re-showed already-rendered text on a one-byte
            # corruption (round-4 review)
            continue
        if kind in ("str", "num", "name"):
            (in_array if array_mode else stack).append((kind, val))
            continue
        op = val
        if op == b"BT":
            x = y = 0.0
            newline(0.0, 0.0)
        elif op == b"ET":
            flush()
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            # operand TYPE check, not just arity: a corrupt stream can
            # leave a string/name where a number belongs, and float +
            # bytes raises TypeError — a type outside the fuzz-pinned
            # clean-failure contract (round-4 review).  Treat it like
            # any other malformed operator: skip.
            if stack[-1][0] == "num" and stack[-2][0] == "num":
                ty = stack[-1][1]
                tx = stack[-2][1]
                if op == b"TD":
                    leading = -ty
                x, y = x + tx, y + ty
                if ty != 0:
                    newline(x, y)
        elif op == b"Tm" and len(stack) >= 6:
            if stack[-1][0] == "num" and stack[-2][0] == "num":
                ny, nx = stack[-1][1], stack[-2][1]
                if ny != y:
                    newline(nx, ny)
                x, y = nx, ny
        elif op == b"T*":
            y -= leading
            newline(x, y)
        elif op == b"TL" and stack and stack[-1][0] == "num":
            leading = stack[-1][1]
        elif op == b"Tj" and stack and stack[-1][0] == "str":
            show(stack[-1][1])
        elif op in (b"'", b'"'):
            y -= leading
            newline(x, y)
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            started = False
            for kind2, v in stack[-1]:
                if kind2 == "str":
                    show(v)
                    started = True
                elif kind2 == "num" and v < -TJ_SPACE_GAP and started:
                    buf.append(" ")
        stack.clear()
    flush()
    return lines


def extract_pdf_layout(blob: bytes) -> List[Tuple[int, int, float, float, str]]:
    """Full layout parse: rows of (page, line_no, x, y, text) over every
    page in catalog order."""
    objs = _scan_objects(blob)
    rows = []
    for pageno, num in enumerate(_page_order(objs)):
        for line_no, (lx, ly, text) in enumerate(
            extract_page_lines(_page_content(num, objs))
        ):
            rows.append((pageno, line_no, lx, ly, text))
    return rows


def extract_pdf_text(blob: bytes) -> str:
    """Plain-text view: lines joined by '\\n', pages by '\\f'.  A
    textless page keeps its (empty) form-feed slot so page indexing
    survives a split('\\f') — dropping blank pages silently shifted
    every later page's text one slot earlier (round-4 review)."""
    objs = _scan_objects(blob)
    n_pages = len(_page_order(objs))
    pages: Dict[int, List[str]] = {}
    for page, _ln, _x, _y, text in extract_pdf_layout(blob):
        pages.setdefault(page, []).append(text)
    return "\f".join("\n".join(pages.get(p, [])) for p in range(n_pages))


# --------------------------------------------------------------------------
# deterministic synth corpus (tests + fixtures; no external data)
# --------------------------------------------------------------------------

_WORDS = (
    "content main article header footer nav menu the quick brown fox "
    "lorem ipsum dolor sit amet spark shuffle partition broadcast "
    "extraction pipeline span media text layout page stream object"
).split()


def synth_pdf_blob(ref: str) -> bytes:
    """Deterministic multi-page PDF for a ref.  Exercises the whole
    parser surface: 1-3 pages, plain AND FlateDecode streams, Td/TD/T*
    line movement, Tj / TJ-with-kerning / ' show operators, literal
    escapes and hex strings, indirect /Length on even pages."""
    import hashlib

    digest = hashlib.sha256(("pdf:" + ref).encode()).digest()
    rng = __import__("numpy").random.default_rng(int.from_bytes(digest[:8], "little"))
    n_pages = int(rng.integers(1, 4))

    objs: List[bytes] = []  # bodies; object number = index + 1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_nums = []
    content_specs = []  # (page_obj_idx placeholder later)
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    # reserve catalog + pages ids after building pages/content
    contents_for_page = []
    for p in range(n_pages):
        n_lines = int(rng.integers(2, 6))
        ops = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for ln in range(n_lines):
            words = [
                _WORDS[int(w)] for w in rng.integers(0, len(_WORDS), rng.integers(3, 8))
            ]
            style = int(rng.integers(0, 4))
            if ln > 0:
                ops.append(b"0 -14 Td" if style != 3 else b"T*")
            if style == 0:
                ops.append(b"(" + " ".join(words).encode() + b") Tj")
            elif style == 1:  # TJ with word-gap kerning between words
                parts = []
                for wi, w in enumerate(words):
                    if wi:
                        parts.append(b"-250")
                    parts.append(b"(" + w.encode() + b")")
                ops.append(b"[ " + b" ".join(parts) + b" ] TJ")
            elif style == 2:  # hex string + escape
                s = " ".join(words)
                ops.append(b"<" + s.encode().hex().encode() + b"> Tj")
            else:  # ' next-line show (after the T* above it still works)
                ops.append(b"(" + " ".join(words).encode() + b") Tj")
        ops.append(b"ET")
        raw = b"\n".join(ops)
        if p % 2 == 0:
            data = zlib.compress(raw)
            filt = b"/Filter /FlateDecode "
        else:
            data, filt = raw, b""
        if p % 2 == 0:
            len_obj = add(str(len(data)).encode())
            stream = add(
                b"<< " + filt + b"/Length " + str(len_obj).encode() + b" 0 R >>\n"
                b"stream\n" + data + b"\nendstream"
            )
        else:
            stream = add(
                b"<< " + filt + b"/Length " + str(len(data)).encode() + b" >>\n"
                b"stream\n" + data + b"\nendstream"
            )
        contents_for_page.append(stream)

    pages_id = len(objs) + n_pages + 1  # pages node comes after page leaves
    for p in range(n_pages):
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_id, font, contents_for_page[p])
            )
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    pages = add(
        b"<< /Type /Pages /Kids [ " + kids + b" ] /Count %d >>" % n_pages
    )
    assert pages == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    return bytes(out)
