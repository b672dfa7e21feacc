"""Minimal deterministic PDF text layer (stdlib-only: ``zlib``).

The reference's primary ingest format is PDF via Docling
(``extractors_docling.py:100-227``) — a heavyweight ML layout pipeline
that is not installable in this environment. This module implements the
TEXT-LAYER subset that covers digitally-born PDFs (the dominant share of
web-crawled PDFs); scanned/image PDFs yield empty text, exactly like any
non-OCR pipeline:

- **object scan**: every ``stream ... endstream`` segment is considered,
  WITHOUT requiring a valid xref (crawled PDFs frequently ship broken
  xrefs; real readers fall back to scanning too);
- **filters**: ``/FlateDecode`` via zlib, or raw (no filter); streams
  with other filters (DCT images etc.) are skipped — one bad stream must
  never kill the document (O11);
- **text operators** inside ``BT .. ET``: ``Tj`` / ``'`` / ``"`` (show
  string), ``TJ`` (array of strings and kerning numbers), with full PDF
  literal-string escape handling (``\\( \\) \\\\ \\n \\r \\t \\b \\f``,
  octal ``\\ooo``, line continuations) and hex strings ``<...>``;
- **layout**: a ``Td`` / ``TD`` / ``T*`` / ``Tm`` between shows starts a
  new line; BT blocks are joined by newlines; strings inside one line
  concatenate (TJ kerning is ignored — deterministic, documented).

``make_simple_pdf`` is the matching fixture writer (one page, Flate
content stream, valid xref) used by the corpus generator's PDF pages and
the round-trip tests.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_DICT_TOK_RE = re.compile(rb"<<|>>")


def _dict_before(head: bytes) -> bytes:
    """The LAST complete top-level ``<< ... >>`` dictionary in ``head``
    (the stream's dict), handling NESTED dictionaries — a regex that
    forbids ``<<`` inside the match would misparse the common
    ``/DecodeParms << /Predictor N >>`` shape and silently drop the
    stream's /Filter."""
    best = b""
    start = None
    depth = 0
    for m in _DICT_TOK_RE.finditer(head):
        if m.group(0) == b"<<":
            if depth == 0:
                start = m.start()
            depth += 1
        else:
            if depth > 0:
                depth -= 1
                if depth == 0 and start is not None:
                    best = head[start:m.end()]
    return best

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _decode_literal(body: bytes) -> str:
    """PDF literal-string body (inside parens) -> text, applying the
    escape rules of PDF 32000-1 §7.3.4.2. Bytes map via latin-1 (the
    identity byte map; real font encodings are out of subset scope)."""
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        b = body[i]
        if b != 0x5C:  # backslash
            out.append(chr(b))
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = body[i]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < min(i + 3, n) and 0x30 <= body[j] <= 0x37:
                j += 1
            out.append(chr(int(body[i:j], 8) & 0xFF))
            i = j
        elif e in (0x0A, 0x0D):  # line continuation: swallow EOL
            i += 1
            if e == 0x0D and i < n and body[i] == 0x0A:
                i += 1
        else:  # unknown escape: backslash is dropped, char kept
            out.append(chr(e))
            i += 1
    return "".join(out)


def _decode_hex(body: bytes) -> str:
    hexed = re.sub(rb"\s", b"", body)
    if len(hexed) % 2:
        hexed += b"0"  # spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(hexed.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _iter_content_tokens(seg: bytes):
    """Yield ('str', text) and ('op', name) tokens from a BT..ET body."""
    i, n = 0, len(seg)
    while i < n:
        b = seg[i]
        if b == 0x28:  # ( literal string, parens nest, backslash escapes
            depth, j = 1, i + 1
            start = j
            while j < n and depth:
                c = seg[j]
                if c == 0x5C:
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                j += 1
            yield "str", _decode_literal(seg[start:j - 1])
            i = j
        elif b == 0x3C and not seg.startswith(b"<<", i):  # hex string
            j = seg.find(b">", i + 1)
            if j < 0:
                break
            yield "str", _decode_hex(seg[i + 1:j])
            i = j + 1
        elif seg.startswith(b"<<", i):  # inline dict: skip balanced
            depth, j = 1, i + 2
            while j < n - 1 and depth:
                if seg.startswith(b"<<", j):
                    depth += 1
                    j += 2
                elif seg.startswith(b">>", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            i = j
        else:
            m = re.match(rb"[A-Za-z'\"*]+", seg[i:])
            if m:
                yield "op", m.group(0).decode("latin-1")
                i += m.end()
            else:
                i += 1


def _stream_text(content: bytes) -> str:
    """One decoded content stream -> text. A single tokenizer pass tracks
    BT/ET as OPERATORS (never regex-split: the literal string '(ET)'
    contains the byte pair ET, but the tokenizer consumes literals
    atomically so it can't be mistaken for the end of a text block).
    Pending strings flush to a line on a line-move operator
    (Td/TD/T*/Tm), on the quote show-ops, and at ET."""
    lines: list[str] = []
    cur: list[str] = []
    in_text = False

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for kind, val in _iter_content_tokens(content):
        if kind == "op":
            if val == "BT":
                in_text = True
            elif val == "ET":
                flush()
                in_text = False
            elif not in_text:
                continue
            elif val in ("Td", "TD", "T*", "Tm"):
                flush()
            elif val in ("'", '"'):
                # quote ops mean: next-line THEN show — the string was
                # already buffered, so move it to its own line
                s = cur.pop() if cur else ""
                flush()
                cur.append(s)
        elif kind == "str" and in_text:
            cur.append(val)
    flush()
    return "\n".join(line for line in lines if line.strip() != "")


def pdf_to_text(data: bytes | bytearray | None) -> str:
    """PDF bytes -> extracted text (deterministic text-layer subset)."""
    if not data:
        return ""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        return ""
    blocks: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        head = data[max(0, m.start() - 800):m.start()]
        filt = _dict_before(head)
        # honor a literal /Length when it checks out: the regex capture
        # ends at the FIRST 'endstream' byte-sequence, which deflate
        # output can legitimately contain — the declared length is exact
        lm = re.search(rb"/Length\s+(\d+)\b", filt)
        if lm:
            start = m.start(1)
            end = start + int(lm.group(1))
            if end <= len(data) and b"endstream" in data[end:end + 20]:
                raw = data[start:end]
        if b"/FlateDecode" in filt:
            try:
                # decompressobj, NOT decompress: the captured segment ends
                # with the EOL separator before 'endstream', and stripping
                # it naively would also eat real deflate bytes that happen
                # to be 0x0A/0x0D — decompressobj just leaves the trailer
                # in unused_data
                raw = zlib.decompressobj().decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in filt:
            continue  # unsupported filter (images etc.)
        t = _stream_text(raw)
        if t:
            blocks.append(t)
    return "\n".join(blocks)


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_simple_pdf(lines: list[str], compress: bool = True) -> bytes:
    """One-page text PDF with a Flate (or raw) content stream and a valid
    xref — the corpus fixture writer and round-trip-test counterpart of
    ``pdf_to_text``. Non-latin-1 characters are replaced ('?'), matching
    the subset contract."""
    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        safe = _escape_literal(line).encode("latin-1", "replace") \
            .decode("latin-1")
        ops.append(f"({safe}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""

    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< " + filt + f"/Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
