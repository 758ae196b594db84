"""File-format parser sources (reference S5-S11).

The reference ingests uploaded files through a parser factory keyed by
extension (reference: modules/mrc_service/file_parser/parser_manager.py:16-63)
and splits parsed text into length-filtered paragraphs. Spark mapping:

  binaryFile scan -> extension dispatch (CASE WHEN) -> per-format pandas
  UDF -> split paragraphs -> explode -> length filter

TEXT parsing is fully implemented (pure stdlib, text_parser.py:5-14
semantics). PDF/DOCX/HWP/PPTX require third-party decoders (pdfminer,
docx2txt, olefile, python-pptx) that this container does not ship; each is
import-gated — the Spark plumbing (dispatch, schema, batch shape, paragraph
splitting) is real and tested through the TEXT path, and the decoder
raises ``NotImplementedError`` naming the missing library, matching the
task's stub contract for unavailable media libs.
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


def _missing(lib: str, fmt: str) -> Callable[[bytes], list]:
    def stub(buf: bytes) -> list:
        raise NotImplementedError(
            f"{fmt} parsing requires '{lib}', which is not installed in this "
            f"environment; the Spark plumbing (dispatch/schema/explode) is "
            f"exercised via the TEXT path"
        )

    return stub


def parse_pdf_buffer(buf: bytes) -> list[str]:
    """PDF: pdfminer page-interpreter text, split on double newline
    (pdf_parser.py:12-33)."""
    try:
        from pdfminer.high_level import extract_text  # type: ignore
    except ImportError:
        return _missing("pdfminer.six", "PDF")(buf)
    text = extract_text(io.BytesIO(buf))
    return [p for p in text.split("\n\n") if len(p) > MIN_PARAGRAPH_LEN]


def parse_docx_buffer(buf: bytes) -> list[str]:
    """DOCX: docx2txt over BytesIO, split on triple newline
    (docx_parser.py:7-20)."""
    try:
        import docx2txt  # type: ignore
    except ImportError:
        return _missing("docx2txt", "DOCX")(buf)
    text = docx2txt.process(io.BytesIO(buf))
    return [p for p in text.split("\n\n\n") if len(p) > MIN_PARAGRAPH_LEN]


def parse_hwp_buffer(buf: bytes) -> list[str]:
    """HWP: OLE walk + raw-deflate BodyText records, UTF-16 text records
    (tag 67), control-char scrub (hwp_parser.py:11-67). Needs olefile for
    the container; the zlib raw-inflate (wbits=-15) + record-header decode
    (tag = hdr & 0x3ff, len = (hdr >> 20) & 0xfff) are stdlib and kept."""
    try:
        import olefile  # type: ignore
    except ImportError:
        return _missing("olefile", "HWP")(buf)
    ole = olefile.OleFileIO(io.BytesIO(buf))
    sections = sorted(
        (e for e in ole.listdir() if e[0] == "BodyText"),
        key=lambda e: int(e[1].replace("Section", "")),
    )
    out = []
    for sec in sections:
        data = zlib.decompress(ole.openstream(sec).read(), -15)
        i = 0
        while i < len(data):
            hdr = int.from_bytes(data[i : i + 4], "little")
            tag, length = hdr & 0x3FF, (hdr >> 20) & 0xFFF
            if tag == 67:
                text = data[i + 4 : i + 4 + length].decode("utf-16", errors="ignore")
                out.append(text.replace("\n", ""))
            i += 4 + length
    return [p for p in out if len(p) > MIN_PARAGRAPH_LEN]


def parse_pptx_buffer(buf: bytes) -> list[str]:
    """PPTX: slide -> shape -> paragraph text, min length 5
    (ppt_parser.py:7-23)."""
    try:
        from pptx import Presentation  # type: ignore
    except ImportError:
        return _missing("python-pptx", "PPTX")(buf)
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
