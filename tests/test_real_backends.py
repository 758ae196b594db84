"""Conditional parity tests for the real Korean/NLP/PDF backends.

The container ships without MeCab/kss/pdfminer, so the engine exercises
their code paths through deterministic fakes (test_analyzer,
test_extraction). These tests pin the REAL libraries' behavior the day
any of them appears in the environment — they skip cleanly until then
(VERDICT r2 item 10)."""

import importlib.util

import pytest

mecab_available = importlib.util.find_spec("konlpy") is not None
kss_available = importlib.util.find_spec("kss") is not None
pdfminer_available = importlib.util.find_spec("pdfminer") is not None


@pytest.mark.skipif(not mecab_available, reason="konlpy/MeCab not installed")
def test_real_mecab_pos_whitelist_analyze():
    from sifter_mrc_search_engine_spark.functions import analyzer as A

    assert A.try_mecab_backend()
    try:
        # the reference's query analysis keeps only POS-whitelisted words
        # (search_functions.py:13-22); nouns survive, postpositions do not
        terms = A.analyze("한국어 형태소 분석기는 명사를 추출한다")
        assert terms, "MeCab analyzer returned nothing"
        assert "는" not in terms and "를" not in terms  # josa filtered
        # self-tagging postposition trim (C11) works against the real tagger
        assert A.eliminate_final_postposition("서울에서") in ("서울", "서울에서")
    finally:
        A.set_pos_tagger(None)


@pytest.mark.skipif(not kss_available, reason="kss not installed")
def test_real_kss_splitter():
    from sifter_mrc_search_engine_spark.functions import sentences as S

    assert S.try_kss_splitter()
    try:
        got = S.split_sentences("첫 번째 문장입니다. 두 번째 문장입니다.")
        assert len(got) == 2
        assert got[0].startswith("첫")
    finally:
        S.set_splitter(None)


def _minimal_pdf(text: str) -> bytes:
    """Hand-assembled single-page PDF with one text object."""
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


@pytest.mark.skipif(not pdfminer_available, reason="pdfminer not installed")
def test_real_pdfminer_parse():
    from sifter_mrc_search_engine_spark.sources.parsers import parse_pdf_buffer

    text = "a pdf paragraph long enough to clear the ten character gate"
    got = parse_pdf_buffer(_minimal_pdf(text))
    assert any(text.split()[0] in p for p in got), got


@pytest.mark.skipif(not pdfminer_available, reason="pdfminer not installed")
def test_pdfminer_vs_stdlib_reader_same_paragraphs():
    """When pdfminer IS present, parse_pdf_buffer prefers it — pin that
    the stdlib reader (sources/pdf.py) recovers the same paragraph list
    from the same fixture bytes, so the two code paths stay
    interchangeable."""
    from sifter_mrc_search_engine_spark.constants import MIN_PARAGRAPH_LEN
    from sifter_mrc_search_engine_spark.sources.parsers import parse_pdf_buffer
    from sifter_mrc_search_engine_spark.sources.pdf import (
        extract_pdf_text,
        synthesize_pdf,
    )

    pages = [
        ["a first paragraph long enough to clear the gate",
         "a second paragraph equally comfortably long"],
        ["page two paragraph with more than ten characters"],
    ]
    buf = synthesize_pdf(pages)
    via_lib = parse_pdf_buffer(buf)
    via_stdlib = [
        p for p in extract_pdf_text(buf).split("\n\n") if len(p) > MIN_PARAGRAPH_LEN
    ]
    # pdfminer layout analysis may fold whitespace differently; compare
    # word sequences, the signal the index actually consumes
    assert [p.split() for p in via_lib] == [p.split() for p in via_stdlib]


@pytest.mark.skipif(not pdfminer_available, reason="pdfminer not installed")
def test_pdfminer_vs_stdlib_reader_cid_korean():
    """Korean text behind a 2-byte Identity-H /ToUnicode CMap: when
    pdfminer lands, pin that its CID decoding and the stdlib reader's
    recover the same word sequence from the same fixture bytes."""
    from sifter_mrc_search_engine_spark.constants import MIN_PARAGRAPH_LEN
    from sifter_mrc_search_engine_spark.sources.parsers import parse_pdf_buffer
    from sifter_mrc_search_engine_spark.sources.pdf import (
        extract_pdf_text,
        synthesize_pdf,
    )

    pages = [["검색 엔진 문서 구축 파이프라인 테스트 문단",
              "두번째 한국어 문단 역시 충분히 길게 작성"]]
    buf = synthesize_pdf(pages, cid=True)
    via_lib = parse_pdf_buffer(buf)
    via_stdlib = [
        p for p in extract_pdf_text(buf).split("\n\n")
        if len(p) > MIN_PARAGRAPH_LEN
    ]
    assert [p.split() for p in via_lib] == [p.split() for p in via_stdlib]
