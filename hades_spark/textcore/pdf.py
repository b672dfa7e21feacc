"""Deterministic PDF text layer (stdlib-only: ``zlib``).

The reference's primary ingest format is PDF via Docling
(``extractors_docling.py:100-227``) — a heavyweight ML layout pipeline
that is not installable in this environment. This module implements the
TEXT-LAYER subset that covers digitally-born PDFs; scanned/image PDFs
yield empty text, exactly like any non-OCR pipeline.

Structure (round 4 hardening, VERDICT r3 #3):

- **object layer**: a brute scan of top-level ``N G obj`` declarations
  (crawled PDFs frequently ship broken xrefs; real readers fall back to
  scanning too), OVERLAID with validated xref entries — both classic
  ``xref`` tables (with ``/Prev`` chains) and PDF 1.5 **cross-reference
  streams** (``/Type /XRef``, ``/W`` tuple decoding, PNG predictors) —
  plus expansion of **object streams** (``/Type /ObjStm``), where
  modern PDFs keep every non-stream object (catalog, pages, fonts);
- **page walk**: trailer ``/Root`` -> catalog -> ``/Pages`` tree in kid
  order -> per-page ``/Contents`` (ref or array) and ``/Resources``
  ``/Font`` map; falls back to scanning every stream when the page tree
  is absent/broken;
- **fonts**: a font's ``/ToUnicode`` CMap (``bfchar``/``bfrange``,
  code length from the codespace range) decodes composite/CID show
  strings (2-byte hex codes -> UTF-16BE targets); fonts without a CMap
  keep the latin-1 identity byte map;
- **text operators** inside ``BT .. ET``: ``Tj`` / ``'`` / ``"``, ``TJ``
  arrays **with kerning offsets** (an adjustment ≤ -180/1000 text-space
  units inserts a word gap, the conventional word-break threshold),
  full literal-string escapes and hex strings; ``Tf`` switches the
  active font's CMap;
- **filters**: ``/FlateDecode`` (+ ``/DecodeParms`` PNG predictors for
  xref streams); other filters (DCT images etc.) are skipped — one bad
  stream must never kill the document (O11), and an image-only page
  simply yields no text.

``make_simple_pdf`` / ``make_cid_pdf`` are the matching fixture writers
(the former feeds the corpus generator's PDF pages; byte layout
unchanged since round 3 so cached corpora stand).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_DICT_TOK_RE = re.compile(rb"<<|>>")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")

_WS = b"\x00\t\n\x0c\r "


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
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _decode_literal_bytes(body: bytes) -> bytes:
    """PDF literal-string body (inside parens) -> raw string BYTES,
    applying the escape rules of PDF 32000-1 §7.3.4.2. Kept as bytes so
    a composite font's CMap can decode multi-byte codes; the latin-1
    identity map is applied at show time for simple fonts."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        b = body[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = body[i]
        if e in _ESCAPES:
            out += _ESCAPES[e]
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < min(i + 3, n) and 0x30 <= body[j] <= 0x37:
                j += 1
            out.append(int(body[i:j], 8) & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation: swallow EOL
            i += 1
            if e == 0x0D and i < n and body[i] == 0x0A:
                i += 1
        else:  # unknown escape: backslash is dropped, char kept
            out.append(e)
            i += 1
    return bytes(out)


def _decode_literal(body: bytes) -> str:
    """Str-typed wrapper (latin-1 identity map) — the simple-font view."""
    return _decode_literal_bytes(body).decode("latin-1")


def _decode_hex_bytes(body: bytes) -> bytes:
    hexed = re.sub(rb"\s", b"", body)
    if len(hexed) % 2:
        hexed += b"0"  # spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(hexed.decode("ascii"))
    except ValueError:
        return b""


def _decode_hex(body: bytes) -> str:
    return _decode_hex_bytes(body).decode("latin-1")


# --------------------------------------------------------------- content
# inline-image delimiters: ID ends the image dict (must not be the tail
# of a name/keyword), EI ends the binary payload (must be preceded by
# whitespace and followed by a delimiter/EOF — a raw 0x45 0x49 byte pair
# INSIDE the payload flanked by non-delimiters keeps scanning)
_INLINE_ID_RE = re.compile(rb"(?<![A-Za-z/])ID[\x00\x09\x0a\x0c\x0d\x20]")
_INLINE_EI_RE = re.compile(
    rb"[\x00\x09\x0a\x0c\x0d\x20]EI(?=[\x00\x09\x0a\x0c\x0d\x20/\[\]<(]|$)")


def _iter_content_tokens(seg: bytes, inline_images: list | None = None):
    """Yield ('str', bytes), ('op', name), ('num', float), ('name', str)
    and ('br', '['/']') tokens from a content stream. When
    ``inline_images`` is a list, each skipped BI..ID..EI binary payload
    is appended to it (the OCR seam's inline-image inventory — same
    structural delimiters as the skip, so the two paths can't diverge)."""
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
            yield "str", _decode_literal_bytes(seg[start:j - 1])
            i = j
        elif b == 0x3C and not seg.startswith(b"<<", i):  # hex string
            j = seg.find(b">", i + 1)
            if j < 0:
                break
            yield "str", _decode_hex_bytes(seg[i + 1:j])
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
        elif b in (0x5B, 0x5D):  # [ ] — TJ array structure
            yield "br", chr(b)
            i += 1
        elif b == 0x2F:  # /Name (Tf font operand)
            m = re.match(rb"/([^\s()<>\[\]{}/%]*)", seg[i:])
            yield "name", m.group(1).decode("latin-1")
            i += m.end()
        elif (0x30 <= b <= 0x39) or b in (0x2B, 0x2D, 0x2E):  # number
            m = re.match(rb"[-+]?(?:\d+\.?\d*|\.\d+)", seg[i:])
            if m:
                yield "num", float(m.group(0))
                i += m.end()
            else:
                i += 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", seg[i:])
            if m:
                op = m.group(0).decode("latin-1")
                if op == "BI":
                    # inline image: BI <dict pairs> ID <raw binary> EI.
                    # The binary payload is NOT PDF syntax — unbalanced
                    # parens / fake operators inside it would corrupt the
                    # tokenizer, so skip it structurally: find the ID
                    # token (not preceded by a letter or '/', so /ID-ish
                    # names and Interpolate don't match), then the first
                    # whitespace-EI-delimiter sequence after the payload.
                    idm = _INLINE_ID_RE.search(seg, i + m.end())
                    if not idm:
                        break  # truncated image: nothing tokenizable left
                    eim = _INLINE_EI_RE.search(seg, idm.end())
                    if not eim:
                        break
                    if inline_images is not None:
                        inline_images.append(seg[idm.end():eim.start()])
                    i = eim.end()
                    continue
                yield "op", op
                i += m.end()
            else:
                i += 1


# a TJ kerning adjustment at or below this (thousandths of text space)
# renders as a word gap — the conventional word-break threshold
_KERN_SPACE = -180.0


def _show_bytes(raw: bytes, font) -> str:
    """One show-string -> text: through the active font's ToUnicode CMap
    (multi-byte codes) when present, else the latin-1 identity map."""
    if not font:
        return raw.decode("latin-1")
    codelen, cmap = font
    out = []
    for i in range(0, len(raw) - codelen + 1, codelen):
        code = int.from_bytes(raw[i:i + codelen], "big")
        out.append(cmap.get(code, ""))
    return "".join(out)


def _stream_text(content: bytes, fonts: dict | None = None) -> str:
    """One decoded content stream -> text. A single tokenizer pass tracks
    BT/ET as OPERATORS (never regex-split: the literal string '(ET)'
    contains the byte pair ET, but the tokenizer consumes literals
    atomically so it can't be mistaken for the end of a text block).
    Pending strings flush to a line on a line-move operator
    (Td/TD/T*/Tm), on the quote show-ops, and at ET. ``fonts`` maps a
    font resource name -> (code_bytes, ToUnicode dict) or None; ``Tf``
    switches the active map. Inside a TJ array, a kerning number ≤
    ``_KERN_SPACE`` inserts a space (word gap)."""
    fonts = fonts or {}
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    in_array = False
    pending_name: str | None = None
    active = None

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
                in_array = False
            elif val == "Tf":
                active = fonts.get(pending_name)
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
        elif kind == "name":
            pending_name = val
        elif kind == "br":
            in_array = (val == "[") and in_text
        elif kind == "num":
            if in_array and val <= _KERN_SPACE and cur and cur[-1] \
                    and not cur[-1].endswith(" "):
                cur.append(" ")
        elif kind == "str" and in_text:
            cur.append(_show_bytes(val, active))
    flush()
    return "\n".join(line for line in lines if line.strip() != "")


# ------------------------------------------------------ object machinery
class _Cursor:
    """Minimal recursive-descent parser for PDF object syntax: dicts,
    arrays, names, numbers, strings (as bytes), refs ('R', num), bools,
    null. Raises ValueError on malformed input (callers catch and fall
    back to the scan path); every branch advances, so it terminates."""

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def _ws(self):
        b, n = self.b, len(self.b)
        while self.i < n:
            c = b[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # % comment to EOL
                j = self.i
                while j < n and b[j] not in (0x0A, 0x0D):
                    j += 1
                self.i = j
            else:
                break

    def value(self, depth: int = 0):
        if depth > 60:
            raise ValueError("nesting too deep")
        self._ws()
        b, n = self.b, len(self.b)
        i = self.i
        if i >= n:
            raise ValueError("eof")
        c = b[i]
        if b.startswith(b"<<", i):
            self.i = i + 2
            d: dict = {}
            while True:
                self._ws()
                if self.b.startswith(b">>", self.i):
                    self.i += 2
                    return d
                if self.i >= n or self.b[self.i] != 0x2F:
                    raise ValueError("dict key")
                k = self.value(depth + 1)
                d[k] = self.value(depth + 1)
        if c == 0x2F:  # name
            m = re.match(rb"/([^\s()<>\[\]{}/%]*)", b[i:])
            self.i = i + m.end()
            return "/" + m.group(1).decode("latin-1")
        if c == 0x5B:  # array
            self.i = i + 1
            out = []
            while True:
                self._ws()
                if self.i < n and b[self.i] == 0x5D:
                    self.i += 1
                    return out
                out.append(self.value(depth + 1))
        if c == 0x28:  # literal string
            depth2, j = 1, i + 1
            start = j
            while j < n and depth2:
                cc = b[j]
                if cc == 0x5C:
                    j += 2
                    continue
                if cc == 0x28:
                    depth2 += 1
                elif cc == 0x29:
                    depth2 -= 1
                j += 1
            self.i = j
            return _decode_literal_bytes(b[start:j - 1])
        if c == 0x3C:  # hex string
            j = b.find(b">", i + 1)
            if j < 0:
                raise ValueError("hex")
            self.i = j + 1
            return _decode_hex_bytes(b[i + 1:j])
        m = re.match(rb"[-+]?(?:\d+\.?\d*|\.\d+)", b[i:])
        if m:
            tok = m.group(0)
            self.i = i + m.end()
            if b"." not in tok:
                # int: maybe an 'N G R' indirect reference
                save = self.i
                self._ws()
                m2 = re.match(rb"(\d+)\s+R\b", b[self.i:])
                if m2:
                    self.i += m2.end()
                    return ("R", int(tok))
                self.i = save
                return int(tok)
            return float(tok)
        for lit, v in ((b"true", True), (b"false", False), (b"null", None)):
            if b.startswith(lit, i):
                self.i = i + len(lit)
                return v
        raise ValueError(f"unexpected byte {c:#x}")


def _png_unpredict(raw: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (sub/up/avg/paeth) — xref streams are
    conventionally Flate + /Predictor 12 (Up)."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 + rowlen <= len(raw) + rowlen and i < len(raw):
        ft = raw[i]
        i += 1
        row = bytearray(raw[i:i + rowlen])
        if len(row) < rowlen:
            break
        i += rowlen
        if ft == 1:  # sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                bb = prev[j]
                cc = prev[j - bpp] if j >= bpp else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else \
                    (bb if pb <= pc else cc)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


class _Doc:
    """Lazy object index over raw PDF bytes: brute scan of top-level
    ``N G obj`` declarations, xref-table/xref-stream overlay (validated
    offsets only), and ``/ObjStm`` member expansion."""

    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}
        for m in _OBJ_RE.finditer(data):
            self.offsets[int(m.group(1))] = m.end()  # newest wins
        self.inline: dict[int, bytes] = {}  # num -> ObjStm member bytes
        self.cache: dict[int, tuple] = {}
        self.trailer_root = None
        try:
            self._overlay_xrefs()
        except Exception:
            pass
        try:
            self._expand_objstms()
        except Exception:
            pass

    # -- parsing one object ------------------------------------------
    def get(self, num: int):
        """-> (value, decoded_stream_bytes | None)."""
        if num in self.cache:
            return self.cache[num]
        self.cache[num] = (None, None)  # cycle guard
        if num in self.inline:
            cur = _Cursor(self.inline[num])
            val = cur.value()
            self.cache[num] = (val, None)
            return self.cache[num]
        off = self.offsets.get(num)
        if off is None:
            return (None, None)
        cur = _Cursor(self.data, off)
        val = cur.value()
        stream = None
        if isinstance(val, dict):
            cur._ws()
            if self.data.startswith(b"stream", cur.i):
                j = cur.i + 6
                if self.data.startswith(b"\r\n", j):
                    j += 2
                elif self.data.startswith(b"\n", j) or \
                        self.data.startswith(b"\r", j):
                    j += 1
                stream = self._cut_stream(val, j)
        self.cache[num] = (val, stream)
        return self.cache[num]

    def _cut_stream(self, d: dict, start: int):
        length = self.resolve(d.get("/Length"))
        raw = None
        if isinstance(length, int) and start + length <= len(self.data) \
                and b"endstream" in self.data[start + length:
                                              start + length + 20]:
            raw = self.data[start:start + length]
        else:
            end = self.data.find(b"endstream", start)
            if end < 0:
                return None
            raw = self.data[start:end].rstrip(b"\r\n")
        return _apply_filters(d, raw, self)

    def resolve(self, v, depth: int = 0):
        while isinstance(v, tuple) and len(v) == 2 and v[0] == "R":
            if depth > 32:
                return None
            v = self.get(v[1])[0]
            depth += 1
        return v

    def stream_of(self, v) -> bytes | None:
        """Resolve a ref to its DECODED stream bytes."""
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "R":
            return self.get(v[1])[1]
        return None

    def raw_object(self, v) -> tuple:
        """-> (value, RAW stream bytes | None) for a reference — the
        stream is cut but NOT filter-decoded. An image XObject's raw
        stream IS the image file (a /DCTDecode payload is the JPEG
        bytes), which is what an OCR/decode backend consumes and what
        ``_apply_filters`` would refuse as unsupported. ObjStm members
        carry no streams (spec 7.5.7) -> (value, None)."""
        if not (isinstance(v, tuple) and len(v) == 2 and v[0] == "R"):
            return (self.resolve(v), None)
        num = v[1]
        off = self.offsets.get(num)
        if off is None:
            return (self.get(num)[0], None)
        cur = _Cursor(self.data, off)
        val = cur.value()
        if not isinstance(val, dict):
            return (val, None)
        cur._ws()
        if not self.data.startswith(b"stream", cur.i):
            return (val, None)
        j = cur.i + 6
        if self.data.startswith(b"\r\n", j):
            j += 2
        elif self.data.startswith(b"\n", j) or \
                self.data.startswith(b"\r", j):
            j += 1
        length = self.resolve(val.get("/Length"))
        if isinstance(length, int) and j + length <= len(self.data) \
                and b"endstream" in self.data[j + length:j + length + 20]:
            return (val, self.data[j:j + length])
        end = self.data.find(b"endstream", j)
        if end < 0:
            return (val, None)
        return (val, self.data[j:end].rstrip(b"\r\n"))

    # -- xref overlay -------------------------------------------------
    def _overlay_xrefs(self):
        at = self.data.rfind(b"startxref")
        if at < 0:
            return
        m = re.match(rb"\s*(\d+)", self.data[at + 9:])
        if not m:
            return
        offset = int(m.group(1))
        seen: set[int] = set()
        while offset not in seen and 0 <= offset < len(self.data):
            seen.add(offset)
            if self.data.startswith(b"xref", offset):
                offset = self._classic_xref(offset)
            else:
                offset = self._xref_stream(offset)
            if offset is None:
                break

    def _note(self, num: int, off: int):
        """Adopt an xref offset only when it really points at that
        object (crawled PDFs ship broken xrefs; the scan stays
        authoritative otherwise)."""
        m = _OBJ_RE.match(self.data, off) or \
            _OBJ_RE.match(self.data, off, len(self.data))
        if m and int(m.group(1)) == num:
            self.offsets[num] = m.end()

    def _classic_xref(self, offset):
        i = offset + 4
        data = self.data
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*", data[i:])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            for k in range(count):
                ent = data[i:i + 20]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", ent)
                if em and em.group(3) == b"n":
                    self._note(start + k, int(em.group(1)))
                i += 20
        t = data.find(b"trailer", i)
        if t < 0:
            return None
        cur = _Cursor(data, t + 7)
        d = cur.value()
        if not isinstance(d, dict):
            return None
        if self.trailer_root is None:
            self.trailer_root = d.get("/Root")
        prev = d.get("/Prev")
        return prev if isinstance(prev, int) else None

    def _xref_stream(self, offset):
        m = _OBJ_RE.match(self.data, offset)
        if not m:
            # tolerate whitespace before the object header
            m = _OBJ_RE.search(self.data, offset, offset + 32)
            if not m:
                return None
        num = int(m.group(1))
        val, stream = self.get(num)
        if not isinstance(val, dict) or stream is None:
            return None
        w = [int(x) for x in self.resolve(val.get("/W")) or []]
        if len(w) != 3:
            return None
        size = self.resolve(val.get("/Size")) or 0
        index = self.resolve(val.get("/Index")) or [0, size]
        rowlen = sum(w)
        if self.trailer_root is None:
            self.trailer_root = val.get("/Root")
        pos = 0

        def field(row, a, b):
            return int.from_bytes(row[a:b], "big") if b > a else None

        for p in range(0, len(index) - 1, 2):
            start, count = int(index[p]), int(index[p + 1])
            for k in range(count):
                row = stream[pos:pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    break
                t = field(row, 0, w[0])
                f2 = field(row, w[0], w[0] + w[1])
                if t is None:
                    t = 1  # default type when W[0]==0
                if t == 1 and f2 is not None:
                    self._note(start + k, f2)
                # t == 2 (ObjStm member) is covered by _expand_objstms
        prev = val.get("/Prev")
        return prev if isinstance(prev, int) else None

    # -- object streams ----------------------------------------------
    def _expand_objstms(self):
        if b"/ObjStm" not in self.data:
            return
        for num, off in list(self.offsets.items()):
            head = self.data[off:off + 400]
            if b"/ObjStm" not in head:
                continue
            val, stream = self.get(num)
            if not isinstance(val, dict) or stream is None \
                    or val.get("/Type") != "/ObjStm":
                continue
            n = self.resolve(val.get("/N"))
            first = self.resolve(val.get("/First"))
            if not isinstance(n, int) or not isinstance(first, int):
                continue
            header = stream[:first].split()
            pairs = []
            for k in range(0, min(len(header), 2 * n) - 1, 2):
                try:
                    pairs.append((int(header[k]), int(header[k + 1])))
                except ValueError:
                    break
            for idx, (onum, ooff) in enumerate(pairs):
                end = pairs[idx + 1][1] if idx + 1 < len(pairs) \
                    else len(stream) - first
                if onum not in self.offsets:  # top-level wins
                    self.inline[onum] = stream[first + ooff:first + end]


def _apply_filters(d: dict, raw: bytes, doc: "_Doc | None") -> bytes | None:
    """Decode a stream through its /Filter chain (+ PNG predictors).
    None => unsupported filter (image etc.) — skip, never raise."""
    filt = d.get("/Filter")
    if doc is not None:
        filt = doc.resolve(filt)
    filters = filt if isinstance(filt, list) else \
        ([filt] if filt is not None else [])
    for f in filters:
        if f == "/FlateDecode":
            try:
                raw = zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
        else:
            return None
    parms = d.get("/DecodeParms")
    if doc is not None:
        parms = doc.resolve(parms)
    if isinstance(parms, list):
        parms = next((p for p in parms if isinstance(p, dict)), None)
    if isinstance(parms, dict):
        pred = parms.get("/Predictor", 1)
        if isinstance(pred, int) and pred >= 10:
            raw = _png_unpredict(
                raw, int(parms.get("/Columns", 1)),
                int(parms.get("/Colors", 1)),
                int(parms.get("/BitsPerComponent", 8)))
    return raw


# ------------------------------------------------------- ToUnicode CMap
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[|\]")


def _parse_tounicode(b: bytes):
    """ToUnicode CMap stream -> (code_bytes, {code -> text}). Handles
    ``bfchar`` pairs and ``bfrange`` triples (scalar destination with
    increment, or an array of per-code destinations); destination hex is
    UTF-16BE. Code width comes from the codespace range (default 2 — the
    Identity-H convention)."""
    codelen = 2
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", b, re.S)
    if m:
        hm = re.search(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if hm:
            codelen = max(1, len(hm.group(1)) // 2)
    cmap: dict[int, str] = {}

    def utf16(hexbytes: bytes) -> str:
        try:
            return hexbytes.decode("utf-16-be")
        except UnicodeDecodeError:
            return ""

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", b, re.S):
        toks = [t for t in _HEXTOK_RE.finditer(m.group(1)) if t.group(1)]
        for i in range(0, len(toks) - 1, 2):
            src = _decode_hex_bytes(toks[i].group(1))
            dst = _decode_hex_bytes(toks[i + 1].group(1))
            if src:
                cmap[int.from_bytes(src, "big")] = utf16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", b, re.S):
        toks = list(_HEXTOK_RE.finditer(m.group(1)))
        i = 0
        while i < len(toks):
            if not (toks[i].group(1) and i + 2 < len(toks) + 1):
                i += 1
                continue
            if i + 2 >= len(toks) or not toks[i + 1].group(1):
                break
            lo = int.from_bytes(_decode_hex_bytes(toks[i].group(1)), "big")
            hi = int.from_bytes(
                _decode_hex_bytes(toks[i + 1].group(1)), "big")
            nxt = toks[i + 2]
            if nxt.group(0) == b"[":  # array of destinations
                j = i + 3
                code = lo
                while j < len(toks) and toks[j].group(0) != b"]":
                    if toks[j].group(1):
                        cmap[code] = utf16(
                            _decode_hex_bytes(toks[j].group(1)))
                        code += 1
                    j += 1
                i = j + 1
            elif nxt.group(1):
                dst = _decode_hex_bytes(nxt.group(1))
                base = int.from_bytes(dst, "big") if dst else 0
                width = len(dst)
                for k in range(min(hi - lo, 65535) + 1):
                    cmap[lo + k] = utf16(
                        (base + k).to_bytes(max(width, 2), "big"))
                i += 3
            else:
                i += 3
    return codelen, cmap


# Adobe-glyph-list subset: the names real-world /Differences arrays use
# (punctuation + digits + the common Latin-1/typographic set). Names not
# here fall through to the uniXXXX/uXXXXXX rules, then to "".
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "ecircumflex": "ê", "ccedilla": "ç", "ntilde": "ñ",
    "iacute": "í", "oacute": "ó", "uacute": "ú",
    "aring": "å", "oslash": "ø", "ae": "æ",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "dagger": "†", "daggerdbl": "‡", "Euro": "€",
    "sterling": "£", "yen": "¥", "cent": "¢",
    "section": "§", "paragraph": "¶", "copyright": "©",
    "registered": "®", "trademark": "™", "degree": "°",
    "plusminus": "±", "micro": "µ", "periodcentered": "·",
    "guillemotleft": "«", "guillemotright": "»",
    "exclamdown": "¡", "questiondown": "¿",
}

_UNI_NAME_RE = re.compile(r"uni([0-9A-Fa-f]{4})\Z")
_U_NAME_RE = re.compile(r"u([0-9A-Fa-f]{4,6})\Z")


def _glyph_to_char(name: str) -> str:
    if len(name) == 1:  # /a /B /7 ... name IS the character
        return name
    if name in _AGL:
        return _AGL[name]
    m = _UNI_NAME_RE.match(name) or _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
    return ""


def _parse_differences(doc: "_Doc", fobj: dict):
    """Simple-font ``/Encoding << /Differences [...] >>`` -> the same
    (code_bytes, cmap) shape ToUnicode parsing yields: a FULL single-byte
    map — latin-1 identity base (a workable stand-in for Standard/
    WinAnsi, which agree with it on the printable ASCII range real
    corpora mostly use) with the Differences overrides applied. The
    array alternates: an integer sets the next code, following names
    consume consecutive codes."""
    enc = doc.resolve(fobj.get("/Encoding"))
    if not isinstance(enc, dict):
        return None
    diffs = doc.resolve(enc.get("/Differences"))
    if not isinstance(diffs, list):
        return None
    cmap = {i: chr(i) for i in range(256)}
    code = 0
    for item in diffs:
        item = doc.resolve(item)
        if isinstance(item, (int, float)):
            code = int(item)
        elif isinstance(item, str) and item.startswith("/") and code < 256:
            cmap[code] = _glyph_to_char(item[1:])
            code += 1
    return 1, cmap


# ----------------------------------------------------------- page walk
def _page_fonts(doc: _Doc, page: dict) -> dict:
    fonts: dict = {}
    res = doc.resolve(page.get("/Resources"))
    if not isinstance(res, dict):
        return fonts
    fd = doc.resolve(res.get("/Font"))
    if not isinstance(fd, dict):
        return fonts
    for name, fref in fd.items():
        fobj = doc.resolve(fref)
        parsed = None
        if isinstance(fobj, dict):
            if "/ToUnicode" in fobj:
                tub = doc.stream_of(fobj["/ToUnicode"])
                if tub:
                    parsed = _parse_tounicode(tub)
            if parsed is None:
                # simple fonts remapped via /Encoding /Differences
                # (ToUnicode wins when both exist — it is authoritative)
                parsed = _parse_differences(doc, fobj)
        fonts[name[1:]] = parsed  # resource name without '/'
    return fonts


def _walk_pages(doc: _Doc, node, out: list, depth: int = 0):
    if depth > 64 or len(out) > 10_000:
        return
    node = doc.resolve(node)
    if not isinstance(node, dict):
        return
    t = node.get("/Type")
    if t == "/Page":
        out.append(node)
        return
    kids = doc.resolve(node.get("/Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _walk_pages(doc, kid, out, depth + 1)


def _find_pages(doc: _Doc) -> list[dict]:
    """Catalog -> page-tree walk -> flat page list (kid order). Empty
    list when no usable page tree exists."""
    root = doc.trailer_root
    if root is None:  # no/broken trailer: find the catalog by scan
        for num in doc.offsets:
            v = doc.get(num)[0]
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                root = ("R", num)
                break
        for num in doc.inline:
            if root is not None:
                break
            v = doc.get(num)[0]
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                root = ("R", num)
    cat = doc.resolve(root)
    if not isinstance(cat, dict):
        return []
    pages: list[dict] = []
    _walk_pages(doc, cat.get("/Pages"), pages)
    return pages


def _page_content(doc: _Doc, pg: dict) -> bytes:
    """A page's decoded content stream(s), concatenated."""
    contents = pg.get("/Contents")
    refs = doc.resolve(contents) if isinstance(contents, list) \
        else [contents]
    if not isinstance(refs, list):
        return b""
    parts = []
    for r in refs:
        sb = doc.stream_of(r)
        if sb:
            parts.append(sb)
    return b"\n".join(parts)


def _extract_via_pages(doc: _Doc) -> str | None:
    """Page-tree extraction path -> text, or None when no usable page
    tree exists (fall back to the stream scan)."""
    pages = _find_pages(doc)
    if not pages:
        return None
    blocks: list[str] = []
    for pg in pages:
        content = _page_content(doc, pg)
        if not content:
            continue
        t = _stream_text(content, _page_fonts(doc, pg))
        if t:
            blocks.append(t)
    return "\n".join(blocks)


# ------------------------------------------------------------ top level
def _scan_all_streams(data: bytes) -> str:
    """Legacy fallback: every ``stream..endstream`` segment, no page
    tree, latin-1 byte map — the broken-xref / fragment recovery path."""
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


def pdf_to_text(data: bytes | bytearray | None) -> str:
    """PDF bytes -> extracted text.

    Tries the STRUCTURED path first (xref/ObjStm-aware page walk with
    per-font ToUnicode CMaps); on any failure, or when no page tree is
    found, falls back to the stream scan. An image-only document (pages
    whose content has no text operators) cleanly yields "" — the caller's
    routing treats that like any empty extraction."""
    if not data:
        return ""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        return ""
    try:
        doc = _Doc(data)
        t = _extract_via_pages(doc)
        if t is not None:
            return t
    except Exception:
        pass
    return _scan_all_streams(data)


def pdf_page_images(data: bytes | bytearray | None) -> list[dict]:
    """Per-page image inventory — the input side of the OCR seam for
    scanned / image-only pages (reference behavior: Docling layout+OCR,
    ``core/extractors/extractors_docling.py:100-227``).

    Returns one dict per image, page-tree kid order::

        {page_no, name, width, height, filter, payload, page_has_text}

    ``payload`` is the RAW (still-encoded) stream — a /DCTDecode
    XObject's payload is the JPEG file itself; decode is the OCR
    backend's job, not the parser's. Inline images (BI..ID..EI) are
    inventoried via the tokenizer's own skip delimiters under names
    ``inline-<k>`` (dimensions unparsed — the raster header carries
    them). ``page_has_text`` lets callers OCR only pages whose text
    layer came up empty. Never raises; a malformed document or page
    contributes nothing (same contract as ``pdf_to_text``)."""
    if not data:
        return []
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        return []
    try:
        doc = _Doc(data)
        pages = _find_pages(doc)
    except Exception:
        return []
    out: list[dict] = []
    for pno, pg in enumerate(pages):
        try:
            content = _page_content(doc, pg)
            inline: list[bytes] = []
            has_text = False
            if content:
                for _ in _iter_content_tokens(content, inline):
                    pass
                has_text = bool(
                    _stream_text(content, _page_fonts(doc, pg)))
            res = doc.resolve(pg.get("/Resources"))
            xod = doc.resolve(res.get("/XObject")) \
                if isinstance(res, dict) else None
            if isinstance(xod, dict):
                for name, ref in xod.items():
                    val, raw = doc.raw_object(ref)
                    if not (isinstance(val, dict) and raw
                            and val.get("/Subtype") == "/Image"):
                        continue
                    filt = doc.resolve(val.get("/Filter"))
                    if isinstance(filt, list):
                        filt = filt[-1] if filt else None
                    w = doc.resolve(val.get("/Width"))
                    h = doc.resolve(val.get("/Height"))
                    out.append({
                        "page_no": pno, "name": name[1:],
                        "width": w if isinstance(w, int) else None,
                        "height": h if isinstance(h, int) else None,
                        "filter": filt if isinstance(filt, str) else None,
                        "payload": raw, "page_has_text": has_text})
            for k, payload in enumerate(inline):
                out.append({
                    "page_no": pno, "name": f"inline-{k}",
                    "width": None, "height": None, "filter": None,
                    "payload": payload, "page_has_text": has_text})
        except Exception:
            continue
    return out


# ------------------------------------------------------ fixture writers
def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _assemble(objs: list[bytes], xref_stream_last: bool = False) -> bytes:
    """objs[i] is object i+1's body. Classic xref table + trailer, or —
    when the last object is an xref STREAM — just startxref to it."""
    out = bytearray(b"%PDF-1.5\n" if xref_stream_last else b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    if xref_stream_last:
        out += f"startxref\n{offsets[-1]}\n%%EOF\n".encode()
        return bytes(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def make_simple_pdf(lines: list[str], compress: bool = True) -> bytes:
    """One-page text PDF with a Flate (or raw) content stream and a valid
    xref — the corpus fixture writer and round-trip-test counterpart of
    ``pdf_to_text``. Non-latin-1 characters are replaced ('?'), matching
    the subset contract. Byte layout unchanged since round 3 (cached
    bench corpora must stay byte-identical)."""
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
    return _assemble(objs)


def make_differences_pdf(parts: list[tuple[str, dict]]) -> bytes:
    """Fixture: a Type1 font remapped via ``/Encoding /Differences``.
    ``parts`` is a list of (line, {code: glyph_name}) — each line's show
    string uses the raw codes, and extraction must come back through the
    Differences map (e.g. code 1 -> /udieresis -> 'ü')."""
    diffs: dict[int, str] = {}
    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for i, (line, remap) in enumerate(parts):
        diffs.update(remap)
        if i:
            ops.append("0 -14 Td")
        safe = _escape_literal(line).encode("latin-1", "replace") \
            .decode("latin-1")
        ops.append(f"({safe}) Tj")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1"))
    darr = " ".join(f"{c} /{n}" for c, n in sorted(diffs.items()))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        (f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
         f"/Encoding << /Type /Encoding /Differences [ {darr} ] >> "
         f">>").encode("latin-1"),
        b"<< /Filter /FlateDecode " + f"/Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    return _assemble(objs)


def make_inline_image_pdf(lines: list[str],
                          payload: bytes | None = None) -> bytes:
    """Fixture: text, then a BI..ID..EI inline image whose BINARY payload
    contains tokenizer poison (unbalanced parens, fake operators, an EI
    byte-pair with no delimiters), then more text. Extraction must keep
    both text runs and emit nothing from the payload."""
    if payload is None:
        payload = (b"\x00\x01(\x9cET (FAKE) Tj BT \xffnotEIreally"
                   b" EIX noEIyet\xfe\x00")
    parts = [b"BT /F1 11 Tf 72 720 Td (" +
             _escape_literal(lines[0]).encode("latin-1", "replace") +
             b") Tj ET\n"]
    parts.append(b"BI /W 4 /H 2 /CS /G /BPC 8 /F /AHx ID " + payload +
                 b" EI\n")
    for line in lines[1:]:
        parts.append(b"BT /F1 11 Tf 72 600 Td (" +
                     _escape_literal(line).encode("latin-1", "replace") +
                     b") Tj ET\n")
    content = b"".join(parts)
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< " + f"/Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream",
    ]
    return _assemble(objs)


def _tounicode_stream(codes: dict[str, int]) -> bytes:
    """char -> 2-byte code map rendered as a ToUnicode CMap stream."""
    pairs = sorted(codes.items(), key=lambda kv: kv[1])
    body = ["/CIDInit /ProcSet findresource begin",
            "12 dict begin", "begincmap",
            "1 begincodespacerange", "<0000> <FFFF>",
            "endcodespacerange"]
    for i in range(0, len(pairs), 90):
        chunk = pairs[i: i + 90]
        body.append(f"{len(chunk)} beginbfchar")
        for ch, code in chunk:
            body.append(f"<{code:04X}> <{ord(ch):04X}>")
        body.append("endbfchar")
    body += ["endcmap", "CMapName currentdict /CMap defineresource pop",
             "end", "end"]
    return "\n".join(body).encode("latin-1")


def make_cid_pdf(lines: list[str], use_objstm: bool = False,
                 kern: bool = False) -> bytes:
    """A composite-font (Type0 / Identity-H style) fixture: show strings
    are 2-byte CODES that only decode through the /ToUnicode CMap — a
    latin-1 scan of the content yields garbage, so a correct extraction
    PROVES the CMap + page-walk path ran. ``use_objstm=True``
    additionally packs the catalog/pages/page/font dicts into an
    ``/ObjStm`` and references everything from a cross-reference STREAM
    (PDF 1.5 layout, Flate + Up predictor). ``kern=True`` splits each
    line into TJ array segments with a word-gap kerning offset."""
    chars = sorted({c for line in lines for c in line})
    codes = {c: i + 1 for i, c in enumerate(chars)}

    def hexshow(s: str) -> str:
        return "<" + "".join(f"{codes[c]:04X}" for c in s) + ">"

    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        if kern and " " in line:
            words = line.split(" ")
            seg = " ".join  # noqa: F841  (readability)
            arr = " -250 ".join(hexshow(w) for w in words)
            ops.append(f"[{arr}] TJ")
        else:
            ops.append(f"{hexshow(line)} Tj")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1"))
    tuni = _tounicode_stream(codes)

    cat = b"<< /Type /Catalog /Pages 2 0 R >>"
    pgs = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    page = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>")
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>")
    content_obj = (b"<< /Filter /FlateDecode /Length "
                   + str(len(content)).encode() + b" >>\nstream\n"
                   + content + b"\nendstream")
    tuni_obj = (b"<< /Length " + str(len(tuni)).encode()
                + b" >>\nstream\n" + tuni + b"\nendstream")

    if not use_objstm:
        return _assemble([cat, pgs, page, font, content_obj, tuni_obj])

    # --- PDF 1.5 layout: dicts inside an /ObjStm, xref STREAM ---------
    members = [(1, cat), (2, pgs), (3, page), (4, font)]
    bodies = b" ".join(body for _, body in members)
    offs, pos = [], 0
    for _, body in members:
        offs.append(pos)
        pos += len(body) + 1
    header = " ".join(f"{n} {o}" for (n, _), o in
                      zip(members, offs)).encode() + b"\n"
    stm_payload = header + bodies
    first = len(header)
    stm = zlib.compress(stm_payload)
    objstm_obj = (b"<< /Type /ObjStm /N 4 /First " + str(first).encode()
                  + b" /Filter /FlateDecode /Length "
                  + str(len(stm)).encode() + b" >>\nstream\n" + stm
                  + b"\nendstream")

    # object numbering: 5=content, 6=tounicode, 7=objstm, 8=xref stream
    pre = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num, body in ((5, content_obj), (6, tuni_obj), (7, objstm_obj)):
        offsets[num] = len(pre)
        pre += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(pre)

    # xref stream rows, W = [1 2 1]: entries for objects 0..8
    rows = []
    rows.append((0, 0, 65535))                     # 0: free
    for idx in range(4):                           # 1..4: in ObjStm 7
        rows.append((2, 7, idx))
    for num in (5, 6, 7):                          # 5..7: top-level
        rows.append((1, offsets[num], 0))
    rows.append((1, xref_off, 0))                  # 8: the xref stream
    cols = 4
    flat = bytearray()
    for t, f2, f3 in rows:
        flat += bytes([t]) + f2.to_bytes(2, "big") + bytes([f3 & 0xFF])
    # Up predictor (type 2) rows
    pred = bytearray()
    prev = bytes(cols)
    for r in range(0, len(flat), cols):
        row = flat[r:r + cols]
        pred.append(2)
        pred += bytes((row[j] - prev[j]) & 0xFF for j in range(cols))
        prev = row
    xdata = zlib.compress(bytes(pred))
    xref_obj = (b"<< /Type /XRef /Size 9 /W [1 2 1] /Index [0 9] "
                b"/Root 1 0 R /Filter /FlateDecode "
                b"/DecodeParms << /Predictor 12 /Columns 4 >> /Length "
                + str(len(xdata)).encode() + b" >>\nstream\n" + xdata
                + b"\nendstream")
    pre += b"8 0 obj\n" + xref_obj + b"\nendobj\n"
    pre += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(pre)


def make_image_only_pdf() -> bytes:
    """A page whose only content is an (unsupported-filter) image XObject
    draw — the scanned-PDF shape. Text extraction must cleanly yield ''."""
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 64 + b"\xff\xd9"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length " + str(len(fake_jpeg)).encode() + b" >>\nstream\n"
        + fake_jpeg + b"\nendstream",
    ]
    return _assemble(objs)


OCR_MARKER = b"%OCR:"


def make_scanned_pdf(pages: list[str]) -> bytes:
    """Fixture: an N-page scanned document — every page is image-only
    (no text operators), its sole /DCTDecode image XObject embedding the
    page's 'scanned' text utf-8-encoded behind ``OCR_MARKER`` inside the
    fake-JPEG payload. ``FakeOcrBackend`` recognizes exactly that
    marker, standing in for a raster whose pixels render the text —
    ``pdf_to_text`` must yield '' on these while the OCR path recovers
    the full text."""
    objs: list[bytes] = [
        b"",  # 1: catalog, patched below once kid ids are known
        b"",  # 2: pages node
    ]
    kid_ids: list[int] = []
    for text in pages:
        base = len(objs) + 1  # next object number
        kid_ids.append(base)
        content = f"q 612 0 0 792 0 0 cm /Im{base} Do Q".encode()
        payload = (b"\xff\xd8\xff\xe0" + b"\x00" * 8 + OCR_MARKER
                   + text.encode("utf-8") + b"\xff\xd9")
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /XObject << /Im{base} {base + 2} 0 R >> >> "
            f"/Contents {base + 1} 0 R >>".encode())
        objs.append(b"<< /Length " + str(len(content)).encode()
                    + b" >>\nstream\n" + content + b"\nendstream")
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width 1275 /Height 1650 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /DCTDecode /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream")
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{k} 0 R" for k in kid_ids)
    objs[1] = (f"<< /Type /Pages /Kids [{kids}] "
               f"/Count {len(kid_ids)} >>").encode()
    return _assemble(objs)
