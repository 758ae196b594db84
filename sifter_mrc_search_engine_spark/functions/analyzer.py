"""Tokenizer / query analyzer (reference C10-C12), pluggable backend.

The reference analyzes queries with MeCab POS tagging and keeps tokens whose
tag is in a whitelist (reference: modules/mrc_service/search_functions.py:13-22,
whitelist NNG/NNP/VV/VA/MAG/MM/NNBC/SN/SL), then rejoins with spaces
(search_functions.py:76-80). MeCab is a C library not present in this
environment, so the default backend is a deterministic regex analyzer —
lowercase, extract maximal runs of ``[a-z0-9가-힣]``. Rank-identity only
requires the SAME analyzer on index side and query side (the contract is
self-consistency with the pipeline, pinned by the pytest fixtures); a MeCab
backend slots in via ``set_backend`` when the library exists.

Three forms are provided:
  * ``analyze(str) -> list[str]``      — driver-side / test oracle
  * ``analyze_udf``                    — vectorized pandas UDF (Arrow)
  * ``tokenize_expr(col) -> Column``   — pure-JVM Catalyst expression
    (``regexp_extract_all(lower(col), ...)``) used in the hot index-build
    path so tokenization stays inside WholeStageCodegen; byte-equivalent to
    ``analyze`` for the default backend, and identical to the DuckDB oracle
    SQL ``regexp_extract_all(lower(text), '[a-z0-9가-힣]+')``.
"""

from __future__ import annotations

import re
from typing import Callable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

#: Maximal runs of lowercase-alnum / Hangul syllables. Mirrors the cleaning
#: pipeline's kept alphabet (C8, preprocessor.py:204-207) so analysis after
#: cleaning never produces empty garbage tokens.
TOKEN_PATTERN = "[a-z0-9가-힣]+"
_RE_TOKEN = re.compile(TOKEN_PATTERN)

#: POS whitelist from search_functions.py:16 — used only by the optional
#: MeCab backend.
POS_WHITELIST = ["NNG", "NNP", "VV", "VA", "MAG", "MM", "NNBC", "SN", "SL"]


def _regex_backend(sentence: str) -> List[str]:
    return _RE_TOKEN.findall(sentence.lower())


_backend: Callable[[str], List[str]] = _regex_backend


def set_backend(fn: Callable[[str], List[str]]) -> None:
    """Install an alternative analyzer (e.g. MeCab POS-whitelist per
    search_functions.py:13-22) — must be applied on BOTH index and query
    sides to preserve rank-identity."""
    global _backend
    _backend = fn


#: pluggable MeCab-shaped tagger: ``sentence -> [(word, pos), ...]``
_pos_tagger: Callable[[str], List[tuple]] | None = None


def extract_pos(sentence: str, tagger: Callable[[str], List[tuple]] | None = None) -> List[str]:
    """The reference's query analysis (search_functions.py:13-22): POS-tag
    the sentence, keep words whose tag is in POS_WHITELIST, in order."""
    tagger = tagger or _pos_tagger
    if tagger is None:
        raise ValueError("extract_pos needs a (word, pos) tagger — set_pos_tagger first")
    return [w for w, pos in tagger(sentence) if pos in POS_WHITELIST]


def set_pos_tagger(tagger: Callable[[str], List[tuple]] | None) -> None:
    """Install a MeCab-shaped ``(word, pos)`` tagger.

    Switches the analyze backend to the reference's POS-whitelist path
    (P5/C10) and lets :func:`eliminate_final_postposition` self-tag (C11)
    — the full search_functions.py behavior without requiring the C
    library (tests inject a deterministic fake). ``None`` restores the
    default regex backend.
    """
    global _pos_tagger
    _pos_tagger = tagger
    if tagger is None:
        set_backend(_regex_backend)
    else:
        set_backend(lambda s: extract_pos(s, tagger))


def try_mecab_backend() -> bool:
    """Install the reference's MeCab POS-whitelist analyzer if available."""
    try:  # pragma: no cover - mecab not in this environment
        from konlpy.tag import Mecab  # type: ignore

        mecab = Mecab()
        set_pos_tagger(mecab.pos)
        return True
    except Exception:
        return False


def analyze(sentence: str) -> List[str]:
    """Tokenize one string with the active backend (C10 semantics)."""
    if sentence is None:
        return []
    return _backend(sentence)


def rewrite_query(question: str) -> str:
    """Analyzed terms rejoined with spaces — the reference's ``commonQuery``
    construction (search_functions.py:76-80 appends ``word + ' '``; we join,
    which matches after the engine-side whitespace split)."""
    return " ".join(analyze(question))


@pandas_udf(ArrayType(StringType()))
def analyze_udf(s: pd.Series) -> pd.Series:
    """Vectorized DEFAULT-backend analyzer: ``string -> array<string>``.

    WARNING: this UDF resolves ``_backend`` on the EXECUTOR, where the
    module is imported fresh — a backend installed on the driver via
    ``set_backend``/``set_pos_tagger`` does NOT reach it. When a custom
    backend is active, use :func:`make_analyze_udf`, which captures the
    current backend by value and ships it with the UDF.
    """
    return s.map(lambda x: _backend(x) if x is not None else [])


def make_analyze_udf():
    """Build a pandas UDF bound to the CURRENT backend by value.

    cloudpickle serializes the captured callable into the UDF, so a
    driver-installed tagger genuinely runs on executors — without this,
    index-side tokenization would silently fall back to the default
    backend while the query side used the tagger, breaking the
    rank-identity contract's self-consistency.
    """
    backend = _backend

    @pandas_udf(ArrayType(StringType()))
    def bound_analyze_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: backend(x) if x is not None else [])

    return bound_analyze_udf


def tokenize_expr(col: str | Column) -> Column:
    """Catalyst-native tokenization, identical to the default backend.

    Stays JVM-side (WholeStageCodegen) — this is the index-build hot path;
    the pandas UDF form exists for pluggable backends and parity tests.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def valid_parentheses(sentence: str) -> bool:
    """Bracket-balance validation for 3 pair types (C12), matching
    ``vaild_parentheses`` (search_functions.py:24-44) including its
    early-False on mismatched closers."""
    stack: list[str] = []
    pairs = {")": "(", "]": "[", "}": "{"}
    for ch in sentence:
        if ch in "([{":
            stack.append(ch)
        elif ch in ")]}":
            if not stack or stack[-1] != pairs[ch]:
                return False
            stack.pop()
    return not stack


def eliminate_final_postposition(sentence: str, pos_tags=None) -> str:
    """Strip trailing josa/endings right-to-left (C11), matching
    ``eliminate_final_postposition`` (search_functions.py:46-68).

    Tags come from (in order): the ``pos_tags`` argument, the installed
    tagger (:func:`set_pos_tagger`), else none — in which case the input
    is returned unchanged, the reference behavior when MeCab finds no
    matching-tag suffix.
    """
    if pos_tags is None and _pos_tagger is not None:
        pos_tags = _pos_tagger(sentence)
    if not pos_tags:
        return sentence
    strip_pos = {
        "JKS", "JKC", "JKG", "JKO", "JKB", "JKV", "JKQ", "JX", "JC",
        "SSO", "SSC", "SC",
        "VCP", "VCN", "EF", "EC", "ETN", "ETM",
    }
    words = [wp for wp in pos_tags if wp[1] in strip_pos]
    balanced = valid_parentheses(sentence)
    for word, pos in reversed(words):
        # reference precedence: (balanced and pos == 'SSO') or pos == 'SSC'
        if balanced and pos == "SSO" or pos == "SSC":
            break
        if sentence[-len(word):] == word:
            sentence = sentence[: -len(word)]
        else:
            break
    return sentence
