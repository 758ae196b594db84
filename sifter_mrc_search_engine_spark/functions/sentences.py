"""Sentence splitting — the reference's optional ``kss.split_sentences``
step (reference: modules/lm_post_training/extractor.py:131-134,
``split=True``).

kss is a Korean NLP C-extension not present here, so this is a
deterministic rule-based splitter with the same pipeline role: break on
sentence-final punctuation runs ([.!?…] — Korean sentences written with
standard terminators end in 다./요./까? etc., all covered), keep the
terminator with its sentence, never break decimal numbers ("3.14") or
mid-token dots ("e.g" followed by non-space), and trim whitespace.
Pluggable like the analyzer: ``set_splitter`` installs kss when present.

Three forms mirror the analyzer module: ``split_sentences`` (driver /
oracle), ``split_sentences_udf`` (vectorized Arrow), and the ``split=``
flag on sources.extraction.extract_dom wires it into the corpus walk.
"""

from __future__ import annotations

import re
from typing import Callable, List

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

#: a run of sentence terminators followed by whitespace or end-of-text
_BOUNDARY = re.compile(r"([.!?…]+)(\s+|$)")


def _rule_splitter(text: str) -> List[str]:
    out: List[str] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        end = m.end(1)
        # decimal guard: "3.14" — terminator directly between digits never
        # matches here (needs trailing whitespace), but "3. 14" lists do;
        # only split when the sentence so far has non-terminator content
        piece = text[start:end].strip()
        if piece:
            out.append(piece)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out


_splitter: Callable[[str], List[str]] = _rule_splitter


def set_splitter(fn: Callable[[str], List[str]] | None) -> None:
    """Install an alternative splitter (e.g. ``kss.split_sentences``);
    None restores the rule-based default."""
    global _splitter
    _splitter = fn if fn is not None else _rule_splitter


def try_kss_splitter() -> bool:
    """Install kss if available (the reference's exact splitter)."""
    try:  # pragma: no cover - kss not in this environment
        import kss  # type: ignore

        set_splitter(kss.split_sentences)
        return True
    except Exception:
        return False


def split_sentences(text: str) -> List[str]:
    if text is None:
        return []
    return _splitter(text)


@pandas_udf(ArrayType(StringType()))
def split_sentences_udf(s: pd.Series) -> pd.Series:
    """Vectorized DEFAULT splitter: ``string -> array<string>``.

    WARNING: resolves ``_splitter`` on the EXECUTOR (fresh module import)
    — a splitter installed on the driver via ``set_splitter`` does NOT
    reach it. Use :func:`make_split_sentences_udf` when a custom
    splitter is active.
    """
    return s.map(lambda x: _splitter(x) if x is not None else [])


def make_split_sentences_udf():
    """Build a pandas UDF bound to the CURRENT splitter by value, so a
    driver-installed kss ships to executors (same late-binding trap as
    analyzer.make_analyze_udf)."""
    splitter = _splitter

    @pandas_udf(ArrayType(StringType()))
    def bound_split_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: splitter(x) if x is not None else [])

    return bound_split_udf
