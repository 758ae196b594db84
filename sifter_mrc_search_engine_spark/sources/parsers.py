"""File-format parser sources (reference S5-S11).

The reference ingests uploaded files through a parser factory keyed by
extension (reference: modules/mrc_service/file_parser/parser_manager.py:16-63)
and splits parsed text into length-filtered paragraphs. Spark mapping:

  binaryFile scan -> extension dispatch (CASE WHEN) -> per-format pandas
  UDF -> split paragraphs -> explode -> length filter

TEXT and HWP parsing are fully implemented in pure stdlib (HWP rides the
minimal CFB reader in sources/cfb.py — no olefile needed). PDF/DOCX/PPTX
require third-party decoders (pdfminer, docx2txt, python-pptx) that this
container does not ship; each is import-gated — the Spark plumbing
(dispatch, schema, batch shape, paragraph splitting) is real and tested
through the TEXT/HWP paths, and the gated decoders raise
``NotImplementedError`` naming the missing library, matching the task's
stub contract for unavailable media libs.
"""

from __future__ import annotations

import io
import zlib
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..constants import MIN_PARAGRAPH_LEN, MIN_PARAGRAPH_LEN_PPTX

# --- per-format buffer parsers (bytes -> list[str] paragraphs) -------------


def parse_text_buffer(buf: bytes) -> list[str]:
    """TEXT: utf-8 decode, split on triple newline, drop short paragraphs
    (text_parser.py:5-14; min length parser_manager.py:43)."""
    text = buf.decode("utf-8", errors="replace")
    parts = text.split("\n\n\n")
    return [p for p in parts if len(p) > MIN_PARAGRAPH_LEN]


def parse_pdf_buffer(buf: bytes) -> list[str]:
    """PDF: page-interpreter text, split on double newline, length-gated
    (pdf_parser.py:12-33). Uses pdfminer when installed; otherwise the
    stdlib reader (:mod:`.pdf` — body-scan object parse, FlateDecode,
    BT/ET text operators) with the same output shape."""
    try:
        from pdfminer.high_level import extract_text  # type: ignore
    except ImportError:
        # only the IMPORT is guarded: a runtime ImportError from inside
        # pdfminer (e.g. missing 'cryptography' for an encrypted PDF)
        # must surface, not silently reroute to the stdlib reader
        from .pdf import extract_pdf_text

        text = extract_pdf_text(buf)
    else:
        text = extract_text(io.BytesIO(buf))
    return [p for p in text.split("\n\n") if len(p) > MIN_PARAGRAPH_LEN]


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _docx_xml2text(xml_bytes: bytes) -> str:
    """docx2txt.xml2text twin over stdlib ElementTree: preorder walk where
    ``w:p`` contributes "\\n\\n" (BEFORE its runs — docx2txt's iter()
    order), ``w:t`` its text, ``w:tab`` a tab, ``w:br``/``w:cr`` a
    newline."""
    import xml.etree.ElementTree as ET

    text = ""
    for child in ET.fromstring(xml_bytes).iter():
        if child.tag == f"{_W_NS}t":
            text += child.text or ""
        elif child.tag == f"{_W_NS}tab":
            text += "\t"
        elif child.tag in (f"{_W_NS}br", f"{_W_NS}cr"):
            text += "\n"
        elif child.tag == f"{_W_NS}p":
            text += "\n\n"
    return text


def _docx_process_stdlib(buf: bytes) -> str:
    """docx2txt.process twin: DOCX is zip+XML, so the stdlib reads it —
    headers, then word/document.xml, then footers, stripped."""
    import re as _re
    import zipfile

    with zipfile.ZipFile(io.BytesIO(buf)) as z:
        names = set(z.namelist())
        headers = sorted(n for n in names if _re.fullmatch(r"word/header\d*\.xml", n))
        footers = sorted(n for n in names if _re.fullmatch(r"word/footer\d*\.xml", n))
        text = ""
        for name in headers + ["word/document.xml"] + footers:
            if name in names:
                text += _docx_xml2text(z.read(name))
    return text.strip()


def parse_docx_buffer(buf: bytes) -> list[str]:
    """DOCX: paragraph text, split on triple newline, length-gated
    (docx_parser.py:7-20). Uses docx2txt when installed; otherwise the
    stdlib zip+XML twin (:func:`_docx_process_stdlib`) with the same
    output shape."""
    try:
        import docx2txt  # type: ignore

        text = docx2txt.process(io.BytesIO(buf))
    except ImportError:
        text = _docx_process_stdlib(buf)
    return [p for p in text.split("\n\n\n") if len(p) > MIN_PARAGRAPH_LEN]


#: the embedded control sequence the reference scrubs (hwp_parser.py:65)
_HWP_CTRL_SEQ = "\x02捤獥\x00\x00\x00\x00\x02\x02汤捯\x00\x00\x00\x00\x02"
#: HWP text record tag (hwp_parser.py:52)
_HWP_TEXT_TAG = 67


def parse_hwp_buffer(buf: bytes) -> list[str]:
    """HWP v5: CFB walk + raw-deflate BodyText records, UTF-16 text
    records (tag 67), control-char scrub — full hwp_parser.py:11-67
    semantics over the stdlib CFB reader (sources/cfb.py), no olefile:

      * validates FileHeader + HwpSummaryInformation presence (:18-20)
      * compression flag = FileHeader byte 36 bit 0 (:25)
      * sections ordered numerically (:29-32)
      * record header: tag = hdr & 0x3ff, len = (hdr >> 20) & 0xfff (:49-50)
      * STRICT utf-16 decode like the reference (:54) — a record whose
        payload is not valid UTF-16 raises, exactly as hwp_parser.py
        would; the HTTP front door maps that to a 400, not a crash
      * records joined with newlines, then the reference's parse() scrub
        drops \\n, \\r and the embedded control sequence and returns the
        whole document as ONE paragraph (:64-67)
    """
    from .cfb import CfbReader

    cfb = CfbReader(bytes(buf))
    names = cfb.list_streams()
    if ("FileHeader",) not in names or ("\x05HwpSummaryInformation",) not in names:
        raise ValueError("Not Valid HWP.")
    header = cfb.read_stream(("FileHeader",))
    is_compressed = (header[36] & 1) == 1
    nums = sorted(
        int(p[1][len("Section"):])
        for p in names
        if len(p) == 2 and p[0] == "BodyText" and p[1].startswith("Section")
    )
    text = ""
    for num in nums:
        data = cfb.read_stream(("BodyText", f"Section{num}"))
        if is_compressed:
            data = zlib.decompress(data, -15)
        i = 0
        section_text = ""
        while i < len(data):
            hdr = int.from_bytes(data[i : i + 4], "little")
            tag, length = hdr & 0x3FF, (hdr >> 20) & 0xFFF
            if tag == _HWP_TEXT_TAG:
                section_text += data[i + 4 : i + 4 + length].decode("utf-16")
                section_text += "\n"
            i += 4 + length
        text += section_text + "\n"
    content = text.replace("\n", "").replace("\r", "").replace(_HWP_CTRL_SEQ, "")
    # NO length gate: the reference's HwpParser.parse() returns [content]
    # unfiltered (hwp_parser.py:64-67), unlike the TEXT/PDF/DOCX parsers —
    # a short HWP upload must answer, not 404
    return [content]


def hwp_record(tag: int, payload: bytes, level: int = 0) -> bytes:
    """One HWP record: 32-bit header (tag | level<<10 | size<<20) + payload."""
    assert len(payload) < 0xFFF
    hdr = (tag & 0x3FF) | ((level & 0x3FF) << 10) | (len(payload) << 20)
    return hdr.to_bytes(4, "little") + payload


def synthesize_hwp(sections: list[list[str]], compressed: bool = True) -> bytes:
    """Deterministic HWP v5 fixture: each section is a list of text
    records (tag 67, UTF-16LE), raw-deflated when ``compressed``, in a
    CFB container with the FileHeader/SummaryInformation streams the
    reference validates. A non-text record (tag 66) is interleaved so
    parsers must actually filter by tag."""
    from .cfb import cfb_write

    header = bytearray(256)
    header[:15] = b"HWP Document Fi"
    header[36] = 0x01 if compressed else 0x00
    streams: dict[tuple[str, ...], bytes] = {
        ("FileHeader",): bytes(header),
        ("\x05HwpSummaryInformation",): b"\x00" * 48,
    }
    for i, texts in enumerate(sections):
        body = hwp_record(66, b"\x01\x02\x03\x04")  # para-header noise
        for t in texts:
            body += hwp_record(_HWP_TEXT_TAG, t.encode("utf-16-le"))
        streams[("BodyText", f"Section{i}")] = (
            zlib.compress(body)[2:-4] if compressed else body
        )
    return cfb_write(streams)


def _pptx_paragraphs_stdlib(buf: bytes) -> list[str]:
    """python-pptx twin over stdlib zip+XML: slides in numeric order,
    ``a:p`` paragraphs in shape-tree document order, each paragraph the
    concatenation of its ``a:t`` runs (``a:br`` -> "\\v", python-pptx's
    line-break convention)."""
    import re as _re
    import xml.etree.ElementTree as ET
    import zipfile

    out: list[str] = []
    with zipfile.ZipFile(io.BytesIO(buf)) as z:
        slides = sorted(
            (n for n in z.namelist() if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(_re.search(r"slide(\d+)\.xml", n).group(1)),
        )
        for name in slides:
            for p in ET.fromstring(z.read(name)).iter(f"{_A_NS}p"):
                buf_parts = []
                for node in p.iter():
                    if node.tag == f"{_A_NS}t":
                        buf_parts.append(node.text or "")
                    elif node.tag == f"{_A_NS}br":
                        buf_parts.append("\v")
                out.append("".join(buf_parts))
    return out


def synthesize_docx(paragraphs: list[str], headers: list[str] | None = None) -> bytes:
    """Deterministic minimal DOCX fixture: word/document.xml (plus
    optional word/header1.xml) with one ``w:p``/``w:r``/``w:t`` per
    paragraph — enough structure for both docx2txt and the stdlib twin."""
    import zipfile

    def esc(t: str) -> str:
        return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def doc_xml(paras: list[str]) -> str:
        body = "".join(f"<w:p><w:r><w:t>{esc(p)}</w:t></w:r></w:p>" for p in paras)
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{_W_NS[1:-1]}"><w:body>{body}</w:body></w:document>'
        )

    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types"/>',
        )
        if headers:
            z.writestr(
                "word/header1.xml",
                doc_xml(headers).replace("w:document", "w:hdr").replace("<w:body>", "").replace("</w:body>", ""),
            )
        z.writestr("word/document.xml", doc_xml(paragraphs))
    return out.getvalue()


def synthesize_pptx(slides: list[list[str]]) -> bytes:
    """Deterministic minimal PPTX fixture: one ppt/slides/slideN.xml per
    slide, each paragraph an ``a:p`` with one ``a:r``/``a:t`` run."""
    import zipfile

    def esc(t: str) -> str:
        return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types"/>',
        )
        for i, paras in enumerate(slides, start=1):
            body = "".join(
                f"<a:p><a:r><a:t>{esc(p)}</a:t></a:r></a:p>" for p in paras
            )
            z.writestr(
                f"ppt/slides/slide{i}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
                f'xmlns:a="{_A_NS[1:-1]}"><p:cSld><p:spTree>'
                f"<p:sp><p:txBody>{body}</p:txBody></p:sp>"
                "</p:spTree></p:cSld></p:sld>",
            )
    return out.getvalue()


def parse_pptx_buffer(buf: bytes) -> list[str]:
    """PPTX: slide -> shape -> paragraph text, min length 5
    (ppt_parser.py:7-23). Uses python-pptx when installed; otherwise the
    stdlib zip+XML twin."""
    try:
        from pptx import Presentation  # type: ignore
    except ImportError:
        paras = _pptx_paragraphs_stdlib(buf)
        return [t for t in paras if len(t) > MIN_PARAGRAPH_LEN_PPTX]
    prs = Presentation(io.BytesIO(buf))
    out = []
    for slide in prs.slides:
        for shape in slide.shapes:
            if shape.has_text_frame:
                for para in shape.text_frame.paragraphs:
                    t = "".join(run.text for run in para.runs)
                    if len(t) > MIN_PARAGRAPH_LEN_PPTX:
                        out.append(t)
    return out


#: S11 dispatch table (parser_manager.py:16-41 FileType enum)
PARSERS: dict[str, Callable[[bytes], list]] = {
    "txt": parse_text_buffer,
    "pdf": parse_pdf_buffer,
    "docx": parse_docx_buffer,
    "hwp": parse_hwp_buffer,
    "pptx": parse_pptx_buffer,
}


@pandas_udf(ArrayType(StringType()))
def parse_file_udf(ext: pd.Series, content: pd.Series) -> pd.Series:
    """Vectorized dispatch parser: (extension, bytes) -> paragraphs."""

    def one(e, buf):
        if buf is None:
            return []
        fn = PARSERS.get((e or "").lower())
        if fn is None:
            raise ValueError(f"unsupported file type: {e!r}")
        return fn(bytes(buf))

    return pd.Series([one(e, b) for e, b in zip(ext, content)])


def read_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S5: binary file source -> (path, ext, content)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return df.select(F.col("path"), ext.alias("ext"), F.col("content"))


def parse_files(files: DataFrame) -> DataFrame:
    """Ingestion lifecycle (SURVEY §3.2): parse -> explode paragraphs.

    Returns ``(path, paragraph_idx, paragraph)``.
    """
    return files.select(
        "path",
        F.posexplode(parse_file_udf(F.col("ext"), F.col("content"))).alias(
            "paragraph_idx", "paragraph"
        ),
    )
