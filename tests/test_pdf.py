"""Stdlib PDF reader (S7): sources/pdf.py implements the text-bearing
subset of ISO 32000 (body-scan object parse, FlateDecode, BT/ET text
operators) the way sources/cfb.py implements [MS-CFB] for HWP —
reference semantics from pdf_parser.py:12-33 (pdfminer page text,
paragraphs split on "\n\n", length gate)."""

import zlib

import pytest

from sifter_mrc_search_engine_spark.sources.parsers import (
    PARSERS,
    parse_files,
    parse_pdf_buffer,
    read_files,
)
from sifter_mrc_search_engine_spark.sources.pdf import (
    PdfError,
    extract_pdf_text,
    synthesize_pdf,
)

P1 = "The first paragraph has plenty of words in it."
P2 = "Second paragraph also long enough to keep."
P3 = "Third paragraph on page two of the document."


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_pages_and_paragraphs(compress):
    pdf = synthesize_pdf([[P1, P2], [P3]], compress=compress)
    # page boundary and in-page paragraph breaks both surface as "\n\n"
    assert extract_pdf_text(pdf) == f"{P1}\n\n{P2}\n\n{P3}"
    assert parse_pdf_buffer(pdf) == [P1, P2, P3]


def test_length_gate_matches_reference():
    # pdf_parser.py:25 keeps len(p) > length only
    pdf = synthesize_pdf([[P1, "tiny", P2]])
    assert parse_pdf_buffer(pdf) == [P1, P2]
    assert parse_pdf_buffer(synthesize_pdf([["short"]])) == []


def test_hex_strings_and_utf16():
    pdf = synthesize_pdf([[P1]], hex_strings=True)
    assert extract_pdf_text(pdf) == P1
    uni = "Unicode dash — and mu μ inside the paragraph"
    pdf = synthesize_pdf([[uni]], utf16=True)
    assert extract_pdf_text(pdf) == uni


def test_literal_string_escapes():
    tricky = "parens (nested) and \\ backslash\ttab"
    pdf = synthesize_pdf([[tricky]])
    assert extract_pdf_text(pdf) == tricky
    # octal escape and line continuation, hand-built content
    body = b"BT (ab\\056cd\\\nef) Tj ET"
    pdf2 = _wrap_content(body)
    assert extract_pdf_text(pdf2) == "ab.cdef"


def _wrap_content(body: bytes, filt: bytes = b"", length: bytes | None = None) -> bytes:
    """Minimal single-page PDF around a raw content stream body."""
    ln = str(len(body)).encode() if length is None else length
    out = bytearray(b"%PDF-1.4\n")
    out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    out += b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
    out += b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    out += (
        b"4 0 obj\n<< " + filt + b"/Length " + ln + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n"
    )
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_indirect_length_and_no_trailer_fallback():
    # /Length as an indirect ref to an object defined LATER than the
    # stream — the reader delimits by the endstream keyword
    body = b"BT (indirect length paragraph text) Tj ET"
    pdf = bytearray(b"%PDF-1.4\n")
    pdf += b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
    pdf += b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + body + b"\nendstream\nendobj\n"
    pdf += b"5 0 obj\n" + str(len(body)).encode() + b"\nendobj\n"
    # no trailer/catalog: falls back to object-number page order
    assert extract_pdf_text(bytes(pdf)) == "indirect length paragraph text"


def test_catalog_page_order_beats_object_order():
    # Kids list order [5, 3] must override ascending object numbers
    out = bytearray(b"%PDF-1.4\n")
    out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    out += b"2 0 obj\n<< /Type /Pages /Count 2 /Kids [5 0 R 3 0 R] >>\nendobj\n"
    out += b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    b1 = b"BT (second in reading order) Tj ET"
    out += b"4 0 obj\n<< /Length " + str(len(b1)).encode() + b" >>\nstream\n" + b1 + b"\nendstream\nendobj\n"
    out += b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
    b2 = b"BT (first in reading order) Tj ET"
    out += b"6 0 obj\n<< /Length " + str(len(b2)).encode() + b" >>\nstream\n" + b2 + b"\nendstream\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_text(bytes(out)) == (
        "first in reading order\n\nsecond in reading order"
    )


def test_tj_array_and_quote_operators():
    body = (
        b"BT [(Hello) -250 ( world)] TJ (next line shown) ' ET"
    )
    pdf = _wrap_content(body)
    # TJ concatenates strings (kerning numbers ignored); ' breaks line
    assert extract_pdf_text(pdf) == "Hello world\nnext line shown"


def test_unsupported_filter_and_malformed_raise():
    body = zlib.compress(b"BT (x) Tj ET")
    pdf = _wrap_content(body, filt=b"/Filter /LZWDecode ")
    with pytest.raises(PdfError, match="filter"):
        extract_pdf_text(pdf)
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.4\njunk with no objects")
    with pytest.raises(PdfError):
        extract_pdf_text(b"not a pdf")
    # corrupt flate payload
    pdf = _wrap_content(b"\x00\x01broken", filt=b"/Filter /FlateDecode ")
    with pytest.raises(PdfError, match="Flate"):
        extract_pdf_text(pdf)


def test_malformed_objstm_raises_not_silently_empty():
    data = zlib.compress(b"whatever")
    body = (
        b"1 0 obj\n<< /Type /ObjStm /N 1 /First 5 /Filter /FlateDecode /Length "
        + str(len(data)).encode() + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
    )
    with pytest.raises(PdfError, match="ObjStm"):
        extract_pdf_text(b"%PDF-1.5\n" + body)


def test_objstm_pdf15_roundtrip():
    """PDF 1.5 layout (dict objects packed in an ObjStm, binary XRef
    stream, no trailer keyword) extracts identically to the classic
    layout — catalog page order included."""
    pages = [["alpha paragraph one.", "beta paragraph two."], ["gamma page two."]]
    modern = synthesize_pdf(pages, objstm=True)
    assert b"trailer" not in modern and b"/ObjStm" in modern
    assert extract_pdf_text(modern) == extract_pdf_text(synthesize_pdf(pages))


def test_tounicode_cmap_remapped_font():
    """A subset-remapped simple font (codes shifted +1, /ToUnicode CMap
    mapping them back): raw-byte decoding yields ciphertext, so a
    correct extraction PROVES the CMap is interpreted."""
    pages = [["remapped spark text", "second line"]]
    pdf = synthesize_pdf(pages, tounicode=True, compress=False)
    assert b"remapped" not in pdf  # only ciphertext bytes on the wire
    assert extract_pdf_text(pdf) == "remapped spark text\n\nsecond line"
    # combined with the 1.5 layout (cmap stream stays top-level)
    both = synthesize_pdf(pages, tounicode=True, objstm=True)
    assert extract_pdf_text(both) == "remapped spark text\n\nsecond line"


def test_dispatch_routes_pdf():
    pdf = synthesize_pdf([[P1]])
    assert PARSERS["pdf"](pdf) == [P1]


def test_pdf_through_spark_dispatch(spark, tmp_path):
    (tmp_path / "doc.pdf").write_bytes(synthesize_pdf([[P1], [P3]]))
    rows = parse_files(read_files(spark, str(tmp_path))).collect()
    assert sorted(r["paragraph"] for r in rows) == sorted([P1, P3])


from hypothesis import given, settings
from hypothesis import strategies as st

# latin-1-encodable text with the PDF string delimiters/escapes well
# represented; newlines excluded (the writer shows each paragraph as one
# Tj, so embedded \n would be indistinguishable from a line-break op)
_para = st.text(
    alphabet=st.sampled_from(
        list("abcdefgh ()\\\t") + ["\xe9", "\xfc", "%", "<", ">", "/"]
    ),
    min_size=1,
    max_size=60,
).map(lambda s: s.strip() or "x")


@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(st.lists(_para, min_size=1, max_size=4), min_size=1, max_size=3),
    compress=st.booleans(),
    hex_strings=st.booleans(),
)
def test_roundtrip_property(pages, compress, hex_strings):
    """synthesize -> extract recovers every paragraph byte-for-byte for
    any latin-1 text including delimiters, escapes and comment chars."""
    pdf = synthesize_pdf(pages, compress=compress, hex_strings=hex_strings)
    assert extract_pdf_text(pdf) == "\n\n".join(
        "\n\n".join(paras) for paras in pages
    )


def test_indirect_contents_array():
    """/Contents may be an indirect ref TO an array of stream refs — a
    legal, common layout that must not silently extract empty text."""
    body = b"BT (indirect contents array text) Tj ET"
    pdf = bytearray(b"%PDF-1.4\n")
    pdf += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    pdf += b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
    pdf += b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
    pdf += (
        b"4 0 obj\n<< /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )
    pdf += b"5 0 obj\n[4 0 R]\nendobj\n"
    pdf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_text(bytes(pdf)) == "indirect contents array text"


def test_malformed_tounicode_degrades_to_raw_bytes():
    """A CMap whose bfrange increment overflows its declared hex width
    (or any malformed hex) must NOT escape as a bare ValueError: the
    cmap is discarded and text decodes as raw bytes."""
    from sifter_mrc_search_engine_spark.sources.pdf import _parse_tounicode

    # <00> <ff> <80>: codes >= 0x80 overflow the 2-digit dst width
    overflowing = (
        b"1 beginbfrange\n<00> <ff> <80>\nendbfrange\n"
    )
    m = _parse_tounicode(overflowing)
    # parse survives; overflowed entries pad (and replace) instead of
    # raising — every code in the range maps to SOME string
    assert set(m) == set(range(0x100))
    assert all(isinstance(v, str) for v in m.values())
    # genuinely malformed hex -> whole cmap rejected, not an exception
    assert _parse_tounicode(b"1 beginbfchar\n<zz> <0041>\nendbfchar\n") == {}


def test_incremental_update_last_xref_root_wins():
    """A PDF 1.5 incremental update appends a new catalog + XRef stream
    at the end of the file; its /Root must shadow the original's (last
    XRef in file order wins, matching trailer-keyword precedence —
    ADVICE r4: setdefault pinned the FIRST XRef's stale catalog)."""
    import zlib as _zlib

    base = synthesize_pdf([["original text."]], objstm=True, compress=False)
    n = 50  # safely above every object number the writer emits
    content = b"BT /F1 12 Tf (updated text.) Tj ET"
    upd = bytearray(base)
    dict_objs = {
        n: f"<< /Type /Catalog /Pages {n + 1} 0 R >>",
        n + 1: f"<< /Type /Pages /Kids [{n + 2} 0 R] /Count 1 >>",
        n + 2: (
            f"<< /Type /Page /Parent {n + 1} 0 R /Contents {n + 3} 0 R "
            f"/Resources << /Font << /F1 {n + 4} 0 R >> >> >>"
        ),
        n + 4: "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for num, body in dict_objs.items():
        upd += f"{num} 0 obj\n{body}\nendobj\n".encode()
    upd += (
        f"{n + 3} 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content + b"\nendstream\nendobj\n"
    )
    zx = _zlib.compress(b"\x00\x00\x00\x00\x00\xff\xff")
    upd += (
        f"{n + 5} 0 obj\n<< /Type /XRef /Size {n + 6} /W [1 4 2] "
        f"/Root {n} 0 R /Filter /FlateDecode /Length {len(zx)} >>\nstream\n"
        .encode() + zx + b"\nendstream\nendobj\nstartxref\n0\n%%EOF\n"
    )
    assert extract_pdf_text(base) == "original text."
    assert extract_pdf_text(bytes(upd)) == "updated text."


def test_cid_two_byte_cmap_korean():
    """CID/Identity-H subset font (the common CJK PDF shape): shown
    strings are 2-BYTE codes, /ToUnicode carries 4-hex-digit bfchar AND
    bfrange sources. Raw decoding yields garbage, so a correct Korean
    extraction proves the 2-byte CMap path end to end (VERDICT r4 item
    7; the reference gets this via pdfminer, file_parser/pdf_parser.py)."""
    pages = [["검색 엔진 구축", "두번째 문단 테스트"]]
    pdf = synthesize_pdf(pages, cid=True, compress=False)
    assert "검색".encode("utf-16-be").hex() not in pdf.decode("latin-1")
    assert extract_pdf_text(pdf) == "검색 엔진 구축\n\n두번째 문단 테스트"
    # same bytes through the PDF 1.5 ObjStm layout
    both = synthesize_pdf(pages, cid=True, objstm=True)
    assert extract_pdf_text(both) == "검색 엔진 구축\n\n두번째 문단 테스트"


def test_cid_cmap_parser_units():
    """2-byte sources parse into a code_len=2 map; MIXED widths reject
    the whole cmap (all-or-nothing decoding)."""
    from sifter_mrc_search_engine_spark.sources.pdf import _parse_tounicode

    two = _parse_tounicode(
        b"2 beginbfchar\n<ac01> <ad00>\n<ac02> <ad01>\nendbfchar\n"
        b"1 beginbfrange\n<b000> <b002> <c000>\nendbfrange\n"
    )
    assert getattr(two, "code_len", 1) == 2
    assert two[0xAC01] == "관" and two[0xB002] == "쀂"
    mixed = _parse_tounicode(
        b"2 beginbfchar\n<41> <0042>\n<ac01> <ad00>\nendbfchar\n"
    )
    assert mixed == {}


def test_incremental_update_classic_trailer_after_xref_base():
    """The SYMMETRIC hybrid (r5 review): a PDF 1.5 base whose trailer
    lives in an XRef STREAM receives a classic `trailer`-keyword update
    appended last (signing/watermarking tools do this) — the update's
    /Root must win. Trailer sources must merge in FILE ORDER across
    both kinds, not keyword-pass-then-xref-pass."""
    base = synthesize_pdf([["original text."]], objstm=True, compress=False)
    n = 80
    content = b"BT /F1 12 Tf (updated text.) Tj ET"
    upd = bytearray(base)
    for num, body in {
        n: f"<< /Type /Catalog /Pages {n + 1} 0 R >>",
        n + 1: f"<< /Type /Pages /Kids [{n + 2} 0 R] /Count 1 >>",
        n + 2: (
            f"<< /Type /Page /Parent {n + 1} 0 R /Contents {n + 3} 0 R "
            f"/Resources << /Font << /F1 {n + 4} 0 R >> >> >>"
        ),
        n + 4: "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }.items():
        upd += f"{num} 0 obj\n{body}\nendobj\n".encode()
    upd += (
        f"{n + 3} 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content + b"\nendstream\nendobj\n"
    )
    upd += (
        f"trailer\n<< /Size {n + 5} /Root {n} 0 R >>\n"
        f"startxref\n0\n%%EOF\n".encode()
    )
    assert extract_pdf_text(bytes(upd)) == "updated text."
