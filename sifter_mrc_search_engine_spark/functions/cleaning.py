"""Text cleaning: the reference's 9-stage ordered pipeline, byte-identical.

Re-implements ``Preprocessor.remove_special_characters``
(reference: modules/lm_post_training/preprocessor.py:147-212) as a pure
function plus a vectorized pandas UDF. The stage ORDER is semantic
(clean_methods list at preprocessor.py:209): strip -> strip HTML tags ->
strip emails -> strip URLs -> strip brackets (again) -> strip bare jamo ->
collapse 3+ repeats to 2 -> drop non-[Hangul alnum ws] -> collapse blanks.

All regexes run under Python ``re`` (NOT JVM ``regexp_replace``): Python's
``\\w`` and ``\\s`` are Unicode-aware where Java's default differs, and the
byte-identity contract (BASELINE.json input_hint: "byte-identical extracted
text per url") is defined against the reference's Python semantics. The
pandas UDF keeps the work Arrow-batched so no per-row Python crosses the
JVM<->Python boundary row-at-a-time.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Compiled once per worker import; patterns verbatim from
# preprocessor.py:169-207.
_RE_TAG = re.compile(r"<[^>]*>")
_RE_EMAIL = re.compile(r"([a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+)")
_RE_URL = re.compile(r"(http|ftp|https)://(?:[-\w.]|(?:%[\da-fA-F]{2}))+")
_RE_JAMO = re.compile(r"([ㄱ-ㅎㅏ-ㅣ]+)")  # [ㄱ-ㅎㅏ-ㅣ]+
_RE_REPEAT = re.compile(r"(([a-zA-Z0-9가-힣])\2{2,})")
_RE_NOISE = re.compile(r"[^가-힣0-9a-zA-Z\s]")


def clean_text(sentence: str) -> str:
    """Apply the 9 cleaning stages in reference order to one string.

    Mirrors preprocessor.py:166-212 stage by stage, including the
    intentional no-op ``str.replace`` calls inside ``sub_bracket``
    (preprocessor.py:183-184 discard their return values) and the
    findall-then-global-replace semantics of ``sub_repeat_char``
    (preprocessor.py:196-202).
    """
    # C1 strip_sentence (preprocessor.py:166-167)
    sentence = sentence.strip()
    # C2 sub_tag (preprocessor.py:169-171)
    sentence = _RE_TAG.sub("", sentence)
    # C3 sub_email (preprocessor.py:173-175)
    sentence = _RE_EMAIL.sub("", sentence)
    # C4 sub_URL (preprocessor.py:177-179)
    sentence = _RE_URL.sub("", sentence)
    # C5 sub_bracket (preprocessor.py:181-186) — the (이름)/(이메일)
    # replace calls are no-ops in the reference; faithfully omitted.
    sentence = _RE_TAG.sub("", sentence)
    # C6 sub_con_vow (preprocessor.py:188-190)
    sentence = _RE_JAMO.sub("", sentence)
    # C7 sub_repeat_char (preprocessor.py:196-202): find every run of 3+
    # identical [a-zA-Z0-9가-힣] chars, then str.replace each matched run
    # globally with its first two chars.
    for run, _ch in _RE_REPEAT.findall(sentence):
        sentence = sentence.replace(run, run[:2])
    # C8 sub_noise (preprocessor.py:204-207)
    sentence = _RE_NOISE.sub("", sentence)
    # C9 sub_blank (preprocessor.py:192-194, applied last per :209)
    sentence = " ".join(sentence.split())
    return sentence


def _clean_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: clean_text(x) if x is not None else None)


@pandas_udf(StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) cleaning UDF: ``string -> string``."""
    return _clean_series(s)


@pandas_udf(StringType())
def extract_html_udf(html: pd.Series) -> pd.Series:
    """HTML(binary or string) -> cleaned text.

    The reference's entire HTML->text extraction is the C2 tag-strip inside
    the cleaning pipeline (preprocessor.py:169-171); extraction therefore ==
    running the full pipeline over the decoded HTML. Accepts bytes (decoded
    utf-8, errors replaced) or str.
    """

    def one(x):
        if x is None:
            return None
        if isinstance(x, (bytes, bytearray)):
            x = bytes(x).decode("utf-8", errors="replace")
        return clean_text(x)

    return html.map(one)
