"""Minimal PDF reader/writer on the stdlib — the PDF sibling of
``sources/cfb.py`` (which plays the same role for HWP's CFB container).

The reference extracts PDF text with pdfminer's page interpreter and
splits paragraphs on blank lines (reference:
modules/mrc_service/file_parser/pdf_parser.py:12-33). pdfminer is not
installed in this environment, so this module implements the subset of
ISO 32000 needed to extract text from ordinary text-bearing PDFs, built
only on ``re``/``zlib``:

* **Body-scan parsing**: indirect objects are parsed SEQUENTIALLY
  (``N G obj`` … ``endobj``), so damaged or absent cross-reference
  tables don't matter (pdfminer is similarly xref-tolerant). PDF 1.5+
  **compressed object streams** (``/Type /ObjStm``) ARE supported: a
  second pass inflates each ObjStm, reads its ``N``/``First`` offset
  header and parses the packed objects. Cross-reference STREAMS
  (``/Type /XRef``) are not decoded (body scan doesn't need offsets)
  but their dict is merged into the trailer, so ``/Root`` — and hence
  catalog page order — still resolves in trailer-less 1.5+ files.
* **Stream filters**: none, ``/FlateDecode`` (zlib), or a filter array
  containing only FlateDecode. Anything else (DCT, LZW, ASCII85…)
  raises :class:`PdfError` rather than silently dropping text.
* **Page order** follows the document catalog (``/Root → /Pages →
  /Kids``, depth-first); object-number order is the fallback when no
  trailer/catalog is present.
* **Text operators** inside ``BT``/``ET``: ``Tj``, ``'``, ``"`` and
  ``TJ`` show strings; ``Td``, ``TD``, ``T*``, ``'``, ``"`` break
  lines (emitted as ``"\\n"``); ``TJ`` kerning numbers are ignored.
* **String decoding**: UTF-16BE when the ``\\xfe\\xff`` BOM is present,
  else Latin-1 (which equals PDFDocEncoding over the printable ASCII
  range). **Single-byte /ToUnicode CMaps** ARE interpreted: the active
  font (tracked through ``Tf``, resources resolved through the page's
  ``/Parent`` chain) maps each string byte through its ``bfchar``/
  ``bfrange`` table, so subset-remapped simple fonts extract real text.
  Multi-byte CID CMaps are not interpreted (composite-font PDFs fall
  back to raw-byte decoding).

:func:`synthesize_pdf` writes deterministic classic-xref fixtures
(valid for pdfminer too: pages carry a Helvetica resource) so tests
exercise the reader without binary fixtures in the repo.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PdfError", "extract_pdf_text", "synthesize_pdf"]


class PdfError(ValueError):
    """Malformed or unsupported PDF (maps to HTTP 400 at the front door)."""


class _Name(str):
    """A PDF name object (/Foo) — distinct from a decoded string."""


class _Ref(tuple):
    """Indirect reference (object number, generation)."""

    __slots__ = ()


class _Keyword(str):
    """A bare keyword token (content-stream operator)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KW_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment runs to end of line
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int) -> tuple[_Name, int]:
    # pos points AT '/'
    pos += 1
    start = pos
    n = len(data)
    while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
        pos += 1
    raw = data[start:pos]
    # #xx hex escapes in names
    if b"#" in raw:
        raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
    return _Name(raw.decode("latin-1")), pos


_ESCAPES = {
    b"n"[0]: b"\n", b"r"[0]: b"\r", b"t"[0]: b"\t", b"b"[0]: b"\b",
    b"f"[0]: b"\x0c", b"("[0]: b"(", b")"[0]: b")", b"\\"[0]: b"\\",
}


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos points AT '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: the char itself
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos points AT '<' (and data[pos+1] != '<')
    end = data.find(b">", pos)
    if end < 0:
        raise PdfError("unterminated hex string")
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode()), end + 1


def _parse_object(data: bytes, pos: int):
    """Parse one PDF object at ``pos`` → (object, new_pos). Bare
    keywords (content-stream operators, true/false/null) come back as
    ``_Name`` so the content tokenizer can reuse this parser."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected end of data")
    c = data[pos]
    if data.startswith(b"<<", pos):
        pos += 2
        d: dict = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            if pos >= len(data):
                raise PdfError("unterminated dictionary")
            key, pos = _parse_name(data, pos)
            val, pos = _parse_object(data, pos)
            d[str(key)] = val
    if c == 0x5B:  # '['
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if pos < len(data) and data[pos] == 0x5D:
                return arr, pos + 1
            if pos >= len(data):
                raise PdfError("unterminated array")
            val, pos = _parse_object(data, pos)
            arr.append(val)
    if c == 0x2F:  # '/'
        return _parse_name(data, pos)
    if c == 0x28:  # '('
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # '<' hex string (not '<<', handled above)
        return _parse_hex_string(data, pos)
    m = _NUM_RE.match(data, pos)
    if m:
        txt = m.group()
        pos2 = m.end()
        # lookahead for an indirect reference: INT INT R
        if b"." not in txt:
            look = _skip_ws(data, pos2)
            m2 = _NUM_RE.match(data, look)
            if m2 and b"." not in m2.group():
                look2 = _skip_ws(data, m2.end())
                if data.startswith(b"R", look2) and (
                    look2 + 1 >= len(data)
                    or data[look2 + 1] in _WS
                    or data[look2 + 1] in _DELIM
                ):
                    return _Ref((int(txt), int(m2.group()))), look2 + 1
            return int(txt), pos2
        return float(txt), pos2
    m = _KW_RE.match(data, pos)
    if m:
        kw = m.group()
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        return _Keyword(kw.decode("latin-1")), m.end()
    raise PdfError(f"cannot parse object at byte {pos} ({data[pos:pos+8]!r})")


class _Document:
    """Parsed object table + trailer of one PDF file."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        self._obj_pos: dict[int, int] = {}  # file offset of each "N 0 obj"
        pos = 0
        while True:
            m = _OBJ_RE.search(data, pos)
            if not m:
                break
            num = int(m.group(1))
            try:
                obj, p = _parse_object(data, m.end())
            except PdfError:
                pos = m.end()
                continue
            p = _skip_ws(data, p)
            if data.startswith(b"stream", p):
                p += len(b"stream")
                if data.startswith(b"\r\n", p):
                    p += 2
                elif data.startswith(b"\n", p):
                    p += 1
                length = obj.get("Length") if isinstance(obj, dict) else None
                if isinstance(length, int):
                    raw = data[p : p + length]
                    p += length
                    end = data.find(b"endstream", p)
                else:
                    # indirect /Length (may reference a later object):
                    # delimit by the endstream keyword instead
                    end = data.find(b"endstream", p)
                    if end < 0:
                        raise PdfError("unterminated stream")
                    raw = data[p:end]
                    if raw.endswith(b"\r\n"):
                        raw = raw[:-2]
                    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                        raw = raw[:-1]
                if end < 0:
                    raise PdfError("unterminated stream")
                p = end + len(b"endstream")
                self.streams[num] = raw
            self.objects[num] = obj
            self._obj_pos[num] = m.start()
            e = data.find(b"endobj", p)
            pos = e + len(b"endobj") if e >= 0 else p
        if not self.objects:
            raise PdfError("no indirect objects found")
        # Trailer resolution: an incrementally-updated file appends its
        # newest update section LAST, and that section's catalog must
        # shadow every earlier one — whether it arrives as a classic
        # `trailer` keyword or a PDF 1.5 /Type /XRef STREAM. So merge
        # BOTH sources in FILE ORDER (r5 review: ordering only the XRef
        # streams regressed the hybrid case where a classic-trailer
        # update follows an XRef-stream base). A truncated source's
        # missing key must not erase an earlier real one (None guard).
        sources: list[tuple[int, dict]] = []
        for m in re.finditer(rb"trailer\b", data):
            try:
                t, _ = _parse_object(data, m.end())
            except PdfError:
                continue
            if isinstance(t, dict):
                sources.append((m.start(), t))
        for num, o in self.objects.items():
            if isinstance(o, dict) and o.get("Type") == "XRef":
                # only the trailer-relevant keys — /W, /Filter, /Index
                # etc. describe the xref stream itself, not the document
                keep = {k: o[k] for k in ("Root", "Info", "Size") if k in o}
                sources.append((self._obj_pos.get(num, 0), keep))
        self.trailer: dict = {}
        for _, t in sorted(sources, key=lambda s: s[0]):
            for k, v in t.items():
                if v is not None:
                    self.trailer[k] = v
        self._unpack_object_streams()

    def _unpack_object_streams(self) -> None:
        """Second pass: inflate each ``/Type /ObjStm`` stream and parse
        the packed objects it carries (ISO 32000 §7.5.7: ``N`` pairs of
        ``objnum offset`` ints, offsets relative to ``First``). Packed
        objects are always direct (no nested streams). A top-level
        definition of the same object number wins — the body scan saw
        it explicitly, which is the closest analogue of an incremental
        update overriding an older packed object."""
        for num in list(self.objects):
            info = self.objects[num]
            if not (isinstance(info, dict) and info.get("Type") == "ObjStm"):
                continue
            data = self.stream_data(num)
            n_objs = self.resolve(info.get("N"))
            first = self.resolve(info.get("First"))
            if not isinstance(n_objs, int) or not isinstance(first, int):
                raise PdfError("ObjStm missing /N or /First")
            pairs: list[tuple[int, int]] = []
            pos = 0
            for _ in range(n_objs):
                pos = _skip_ws(data, pos)
                m1 = _NUM_RE.match(data, pos)
                if not m1 or b"." in m1.group():  # _NUM_RE accepts reals;
                    raise PdfError("bad ObjStm offset header")  # ints only
                pos = _skip_ws(data, m1.end())
                m2 = _NUM_RE.match(data, pos)
                if not m2 or b"." in m2.group():
                    raise PdfError("bad ObjStm offset header")
                pos = m2.end()
                pairs.append((int(m1.group()), int(m2.group())))
            for objnum, off in pairs:
                obj, _ = _parse_object(data, first + off)
                self.objects.setdefault(objnum, obj)

    def resolve(self, obj):
        seen = set()
        while isinstance(obj, _Ref):
            if obj in seen:
                raise PdfError("circular object reference")
            seen.add(obj)
            obj = self.objects.get(obj[0])
        return obj

    def stream_data(self, num: int) -> bytes:
        """Decoded bytes of stream object ``num``."""
        raw = self.streams.get(num, b"")
        info = self.resolve(self.objects.get(num))
        filt = self.resolve(info.get("Filter")) if isinstance(info, dict) else None
        filters = [filt] if isinstance(filt, (str, _Name)) else (filt or [])
        out = raw
        for f in filters:
            f = self.resolve(f)
            if str(f) == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as e:
                    raise PdfError(f"bad FlateDecode stream: {e}") from e
            else:
                raise PdfError(f"unsupported stream filter /{f}")
        return out

    def page_object_numbers(self) -> list[int]:
        """Page objects in catalog order (fallback: object-number order)."""
        root = self.resolve(self.trailer.get("Root"))
        order: list[int] = []

        def walk(ref):
            node = self.resolve(ref)
            if not isinstance(node, dict):
                return
            t = node.get("Type")
            if t == "Page":
                if isinstance(ref, _Ref):
                    order.append(ref[0])
            elif t == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        if isinstance(root, dict) and "Pages" in root:
            walk(root["Pages"])
        if not order:
            order = sorted(
                n
                for n, o in self.objects.items()
                if isinstance(o, dict) and o.get("Type") == "Page"
            )
        return order

    def page_fonts(self, page_num: int) -> dict:
        """``{font_resource_name: _CMap}`` for the page's fonts that
        carry a parseable 1- or 2-byte /ToUnicode CMap (simple and
        CID/Type0 fonts respectively). Resources are inherited through
        the /Parent chain per ISO 32000 §7.7.3.4."""
        node = self.resolve(self.objects.get(page_num))
        res = None
        hops = 0
        while isinstance(node, dict) and hops < 64:
            if "Resources" in node:
                res = self.resolve(node["Resources"])
                break
            node = self.resolve(node.get("Parent"))
            hops += 1
        if not isinstance(res, dict):
            return {}
        fonts = self.resolve(res.get("Font"))
        out: dict = {}
        if not isinstance(fonts, dict):
            return out
        for name, fref in fonts.items():
            fdict = self.resolve(fref)
            if not isinstance(fdict, dict):
                continue
            tu = fdict.get("ToUnicode")
            if isinstance(tu, _Ref) and tu[0] in self.streams:
                cmap = _parse_tounicode(self.stream_data(tu[0]))
                if cmap:
                    out[str(name)] = cmap
        return out

    def page_content(self, page_num: int) -> bytes:
        page = self.resolve(self.objects.get(page_num))
        if not isinstance(page, dict):
            return b""
        contents = page.get("Contents")
        # /Contents may be a stream ref, an array of stream refs, or an
        # indirect ref TO such an array — resolve through the indirection
        # (but keep direct stream refs unresolved: we need the object
        # number to fetch its stream bytes)
        if isinstance(contents, _Ref) and contents[0] not in self.streams:
            contents = self.resolve(contents)
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            r = r if isinstance(r, _Ref) else None
            if r is not None and r[0] in self.streams:
                parts.append(self.stream_data(r[0]))
        return b"\n".join(parts)


class _CMap(dict):
    """/ToUnicode mapping ``{code: unicode_str}``; ``code_len`` is the
    uniform source-code width in BYTES — 1 for simple fonts, 2 for the
    CID/Identity-H subset fonts common in CJK PDFs (the case the
    reference handles via pdfminer, file_parser/pdf_parser.py:12-33)."""

    code_len = 1


def _decode_pdf_string(raw: bytes, cmap: dict | None = None) -> str:
    if cmap is not None:
        w = getattr(cmap, "code_len", 1)
        if w == 1:
            return "".join(cmap.get(b, chr(b)) for b in raw)
        out = []
        for i in range(0, len(raw) - w + 1, w):
            code = int.from_bytes(raw[i : i + w], "big")
            got = cmap.get(code)
            if got is None:
                # unmapped CID fallback: chr() of a code in the UTF-16
                # surrogate range would yield a str that can't be UTF-8
                # encoded — crashing the parquet write downstream, not
                # here — so degrade those to U+FFFD instead
                got = "�" if 0xD800 <= code <= 0xDFFF else chr(code)
            out.append(got)
        if len(raw) % w:  # dangling odd byte: degrade, don't drop
            out.append(chr(raw[-1]))
        return "".join(out)
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_tounicode(cmap_bytes: bytes) -> dict:
    """``_CMap {code: unicode_str}`` from a /ToUnicode CMap's bfchar and
    bfrange sections. Source codes may be 1-byte (2 hex digits, simple
    fonts) or 2-byte (4 hex digits, CID subset fonts) but must be
    UNIFORM across the cmap; destinations are UTF-16BE per the CMap
    spec. Anything the subset grammar can't handle — mixed/other code
    widths, array-form bfrange, malformed/overflowing hex — returns an
    empty map so the caller falls back to raw-byte decoding (a broken
    CMap must degrade the text, not crash per-document ingestion with a
    non-PdfError)."""
    out = _CMap()
    width: int | None = None  # hex digits per source code, pinned by 1st

    def src_ok(tok: bytes) -> bool:
        nonlocal width
        if len(tok) not in (2, 4):
            return False
        if width is None:
            width = len(tok)
        return len(tok) == width

    def dst_str(hx: bytes) -> str:
        s = hx.decode()
        if len(s) % 2:  # odd-width dst (or an increment that overflowed
            s = "0" + s  # the declared width): pad, don't raise
        return bytes.fromhex(s).decode("utf-16-be", errors="replace")

    try:
        for m in _BFCHAR_RE.finditer(cmap_bytes):
            toks = _HEX_RE.findall(m.group(1))
            for src, dst in zip(toks[::2], toks[1::2]):
                if not src_ok(src):
                    return _CMap()
                out[int(src, 16)] = dst_str(dst)
        for m in _BFRANGE_RE.finditer(cmap_bytes):
            body = m.group(1)
            # triples <lo> <hi> <dstlo>; the [array-destination] form is
            # rare in simple fonts and unsupported (whole cmap rejected
            # so decoding stays all-or-nothing)
            if b"[" in body:
                return _CMap()
            toks = _HEX_RE.findall(body)
            for lo, hi, dst in zip(toks[::3], toks[1::3], toks[2::3]):
                if not (src_ok(lo) and src_ok(hi)):
                    return _CMap()
                base = int(dst, 16)
                dwidth = len(dst)
                for c in range(int(lo, 16), int(hi, 16) + 1):
                    out[c] = dst_str(f"{base + c - int(lo, 16):0{dwidth}x}".encode())
    except ValueError:
        return _CMap()
    out.code_len = (width or 2) // 2
    return out


_SHOW_OPS = {"Tj", "'", '"'}
_NEWLINE_OPS = {"Td", "TD", "T*", "'", '"'}


def _text_from_content(content: bytes, fonts: dict | None = None) -> str:
    """Walk a content stream's operand/operator sequence, collecting the
    text-showing operators (pdfminer's interpreter does the same walk;
    we skip glyph metrics/positioning beyond line breaks). ``fonts``
    maps font resource names to /ToUnicode tables; ``Tf`` switches the
    active table."""
    out: list[str] = []
    stack: list = []
    pos = 0
    n = len(content)
    in_text = False
    cmap: dict | None = None
    while True:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        try:
            obj, pos = _parse_object(content, pos)
        except PdfError:
            pos += 1  # inline images etc.: resync byte-by-byte
            continue
        if not isinstance(obj, _Keyword):
            stack.append(obj)  # operand (value or /Name)
            continue
        op = str(obj)
        if op == "BT":
            in_text = True
        elif op == "Tf" and fonts is not None and len(stack) >= 2:
            cmap = fonts.get(str(stack[-2]))
        elif op == "ET":
            in_text = False
        elif in_text:
            if op in _NEWLINE_OPS and out:
                out.append("\n")
            if op in _SHOW_OPS:
                s = stack[-1] if stack else b""
                if isinstance(s, bytes):
                    out.append(_decode_pdf_string(s, cmap))
            elif op == "TJ":
                arr = stack[-1] if stack else []
                if isinstance(arr, list):
                    for el in arr:
                        if isinstance(el, bytes):
                            out.append(_decode_pdf_string(el, cmap))
        stack.clear()
    return "".join(out)


def extract_pdf_text(buf: bytes) -> str:
    """All page text, pages joined with a blank line — the same output
    shape pdfminer's TextConverter gives the reference parser, whose
    ``parse`` splits on ``"\\n\\n"`` (pdf_parser.py:23-26)."""
    doc = _Document(bytes(buf))
    pages = []
    for num in doc.page_object_numbers():
        t = _text_from_content(
            doc.page_content(num), doc.page_fonts(num)
        ).strip("\n")
        pages.append(t)
    return "\n\n".join(pages)


# ---------------------------------------------------------------------------
# Fixture writer


def _pdf_escape(s: str) -> bytes:
    raw = s.encode("latin-1", errors="strict")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def synthesize_pdf(
    pages: list[list[str]],
    compress: bool = True,
    hex_strings: bool = False,
    utf16: bool = False,
    objstm: bool = False,
    tounicode: bool = False,
    cid: bool = False,
) -> bytes:
    """Deterministic classic-xref PDF fixture: one content stream per
    page, each paragraph shown with ``Tj`` and separated by two ``T*``
    line breaks (→ the ``"\\n\\n"`` the reference splits on). Pages
    carry a Helvetica font resource so pdfminer (when installed) can
    interpret the same bytes. ``hex_strings`` shows paragraphs as hex
    strings, ``utf16`` as BOM-prefixed UTF-16BE (stdlib-reader path;
    simple-font viewers would need /ToUnicode for these).

    ``objstm=True`` emits the PDF 1.5 layout instead: every dict-only
    object (catalog, page tree, pages, font) is PACKED into one
    Flate-compressed ``/Type /ObjStm``, content streams stay top-level,
    and the cross-reference is a binary ``/Type /XRef`` STREAM
    (``/W [1 4 2]``, type-1 offset rows for top-level objects, type-2
    ``(objstm, index)`` rows for packed ones) — no ``trailer`` keyword
    anywhere, like modern PDF writers produce.

    ``tounicode=True`` emulates a subset-remapped simple font: every
    shown byte is the character code PLUS ONE, and the font carries a
    /ToUnicode CMap (bfchar entries) mapping the shifted codes back —
    raw-byte decoding yields ciphertext, so extraction is only correct
    if the reader interprets the CMap.

    ``cid=True`` emulates the CJK subset-font shape instead: a Type0 /
    Identity-H composite font whose shown strings are 2-BYTE codes
    (``ord(char) + 0x100``), with a /ToUnicode CMap carrying 4-hex-digit
    sources — two bfchar entries plus one bfrange spanning the rest, so
    both 2-byte forms are exercised. Raw or 1-byte decoding yields
    garbage; only a CID-aware reader recovers the text."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    )
    for i, paras in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode()
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, p in enumerate(paras):
            if j:
                body += b"T* T*\n"
            if cid:
                codes = b"".join(
                    (ord(c) + 0x100).to_bytes(2, "big") for c in p
                )
                body += b"<" + codes.hex().encode() + b"> Tj\n"
            elif tounicode:
                shifted = bytes((ord(c) + 1) & 0xFF for c in p)
                body += b"<" + shifted.hex().encode() + b"> Tj\n"
            elif utf16:
                enc = b"\xfe\xff" + p.encode("utf-16-be")
                body += b"<" + enc.hex().encode() + b"> Tj\n"
            elif hex_strings:
                body += b"<" + p.encode("latin-1").hex().encode() + b"> Tj\n"
            else:
                body += b"(" + _pdf_escape(p) + b") Tj\n"
        body += b"ET"
        data = zlib.compress(bytes(body)) if compress else bytes(body)
        filt = b"/Filter /FlateDecode " if compress else b""
        objs[cont_num] = (
            b"<< " + filt + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    if cid:
        cmap_num, desc_num = font_num + 1, font_num + 2
        used = sorted({ord(c) for paras in pages for p in paras for c in p})
        # first two codes as bfchar, the rest as single-step bfranges —
        # both 2-byte source forms on the wire
        bfchars = "\n".join(
            f"<{c + 0x100:04x}> <{c:04x}>" for c in used[:2]
        )
        bfranges = "\n".join(
            f"<{c + 0x100:04x}> <{c + 0x100:04x}> <{c:04x}>" for c in used[2:]
        )
        cmap_body = (
            "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            "/CMapName /SifterCid2 def\n/CMapType 2 def\n"
            "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            f"{max(len(used[:2]), 1)} beginbfchar\n{bfchars}\nendbfchar\n"
            f"{max(len(used[2:]), 1)} beginbfrange\n{bfranges}\nendbfrange\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
        ).encode()
        zc = zlib.compress(cmap_body)
        objs[cmap_num] = (
            f"<< /Filter /FlateDecode /Length {len(zc)} >>".encode()
            + b"\nstream\n" + zc + b"\nendstream"
        )
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SifterCJK "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        objs[font_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /SifterCJK "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f"/ToUnicode {cmap_num} 0 R >>"
        ).encode()
    elif tounicode:
        cmap_num = font_num + 1
        used = sorted({ord(c) for paras in pages for p in paras for c in p})
        bfchars = "\n".join(f"<{(c + 1) & 0xFF:02x}> <{c:04x}>" for c in used)
        cmap_body = (
            "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            "/CMapName /SifterShift1 def\n/CMapType 2 def\n"
            "1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            f"{len(used)} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
        ).encode()
        zc = zlib.compress(cmap_body)
        objs[cmap_num] = (
            f"<< /Filter /FlateDecode /Length {len(zc)} >>".encode()
            + b"\nstream\n" + zc + b"\nendstream"
        )
        objs[font_num] = (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/ToUnicode {cmap_num} 0 R >>"
        ).encode()
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )

    if objstm:
        return _serialize_objstm(objs, n_pages, font_num)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objs) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _serialize_objstm(objs: dict[int, bytes], n_pages: int, font_num: int) -> bytes:
    """PDF 1.5 serialization: dict-only objects packed into one ObjStm,
    stream objects top-level, binary XRef stream, no trailer keyword."""
    packed_nums = [1, 2] + [3 + 2 * i for i in range(n_pages)] + [font_num]
    stream_nums = sorted(n for n in objs if n not in packed_nums)
    objstm_num = max(objs) + 1
    xref_num = objstm_num + 1

    # ObjStm payload: "objnum offset" header pairs, then the objects
    bodies = [objs[n] + b"\n" for n in packed_nums]
    offs, acc = [], 0
    for b in bodies:
        offs.append(acc)
        acc += len(b)
    header = " ".join(
        f"{n} {o}" for n, o in zip(packed_nums, offs)
    ).encode() + b"\n"
    payload = header + b"".join(bodies)
    z = zlib.compress(payload)
    objstm_obj = (
        f"<< /Type /ObjStm /N {len(packed_nums)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(z)} >>".encode()
        + b"\nstream\n" + z + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in stream_nums:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode() + objstm_obj + b"\nendobj\n"

    # XRef stream: W [1 4 2]; type 0 = free, 1 = (offset, gen),
    # 2 = (objstm number, index within it)
    size = xref_num + 1
    rows = bytearray()

    def row(t: int, f2: int, f3: int) -> None:
        rows.extend(bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big"))

    xref_at = len(out)
    for num in range(size):
        if num == 0:
            row(0, 0, 65535)
        elif num in packed_nums:
            row(2, objstm_num, packed_nums.index(num))
        elif num == xref_num:
            row(1, xref_at, 0)
        else:
            row(1, offsets[num], 0)
    zx = zlib.compress(bytes(rows))
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R /Filter /FlateDecode /Length {len(zx)} >>".encode()
        + b"\nstream\n" + zx + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)
