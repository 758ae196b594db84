"""Stdlib DOCX/PPTX parsers (S8/S10): both formats are zip+XML, so the
stdlib reads them the way sources/cfb.py reads HWP's OLE container —
reference semantics from docx_parser.py:7-20 (docx2txt text shape, triple-
newline split, length gate) and ppt_parser.py:7-23 (slide -> shape ->
paragraph list, length > 5)."""

import pytest

from sifter_mrc_search_engine_spark.sources.parsers import (
    _docx_process_stdlib,
    _pptx_paragraphs_stdlib,
    parse_docx_buffer,
    parse_files,
    parse_pptx_buffer,
    read_files,
    synthesize_docx,
    synthesize_pptx,
)

P1 = "the first body paragraph long enough to pass the gate"
P2 = "a second paragraph also comfortably past ten characters"


def test_docx_text_shape_matches_docx2txt_convention():
    # docx2txt's xml2text emits "\n\n" at each w:p BEFORE its runs, then
    # process() strips — so two non-empty paragraphs join as p1\n\np2
    buf = synthesize_docx([P1, P2])
    assert _docx_process_stdlib(buf) == f"{P1}\n\n{P2}"


def test_docx_split_and_length_gate():
    # an EMPTY w:p makes a 4-newline run; the reference splits on \n\n\n
    buf = synthesize_docx([P1, "", P2, "tiny"])
    got = parse_docx_buffer(buf)
    # chunks after split: [P1, "\nP2\n\ntiny"] — gate drops nothing here;
    # a standalone short doc is dropped entirely
    assert got == [P1, f"\n{P2}\n\ntiny"]
    assert parse_docx_buffer(synthesize_docx(["short"])) == []


def test_docx_headers_precede_body():
    buf = synthesize_docx([P1], headers=["the running header text of the doc"])
    text = _docx_process_stdlib(buf)
    assert text.index("running header") < text.index("first body")


def test_pptx_slide_paragraphs_and_gate():
    buf = synthesize_pptx([[P1, "tiny"], [P2]])
    # paragraph LIST (no joining), numeric slide order, len > 5 gate
    assert parse_pptx_buffer(buf) == [P1, P2]
    assert _pptx_paragraphs_stdlib(buf) == [P1, "tiny", P2]


def test_pptx_numeric_slide_order():
    # 11 slides: lexicographic order would put slide10 after slide1
    slides = [[f"slide number {i} paragraph text"] for i in range(1, 12)]
    buf = synthesize_pptx(slides)
    got = parse_pptx_buffer(buf)
    assert got == [s[0] for s in slides]


def test_docx_pptx_through_spark_dispatch(spark, tmp_path):
    (tmp_path / "a.docx").write_bytes(synthesize_docx([P1]))
    (tmp_path / "b.pptx").write_bytes(synthesize_pptx([[P2]]))
    rows = parse_files(read_files(spark, str(tmp_path))).collect()
    got = {r["path"].rsplit("/", 1)[-1]: r["paragraph"] for r in rows}
    assert got == {"a.docx": P1, "b.pptx": P2}
