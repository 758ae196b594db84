"""Byte-identity contract for the cleaning pipeline.

Golden pairs ported verbatim from the reference suite
(/root/reference/tests/lm_post_training/preprocessor_test.py:60-63), plus
edge cases exercising each stage C1-C9 individually.
"""

import pandas as pd
import pytest

from sifter_mrc_search_engine_spark.functions.cleaning import clean_text, _clean_series

# (input, expected) — the 8 reference golden pairs, verbatim.
REFERENCE_GOLDENS = [
    (" test ", "test"),
    ("<html>test</html>", "test"),
    ("abcdef123456@naver.com test", "test"),
    ("!t@e#$s%t^&*()", "test"),
    ("😀😃😄t😁e😆😅s😂t", "test"),
    ("tㅔeㅔsㅅtㅌ", "test"),
    ("전전전전긍긍긍긍", "전전긍긍"),
    ("t   e   s   t", "t e s t"),
]

EXTENDED_GOLDENS = [
    # C2/C5: nested tags, attributes
    ('<div class="a"><p>hello <b>world</b></p></div>', "hello world"),
    # C3: email mid-sentence
    ("mail me at a.b+c@ex-ample.co.kr now", "mail me at now"),
    # C4: URL schemes + %-escapes. NOTE: the reference pattern
    # (?:[-\w.]|(?:%[\da-fA-F]{2}))+ does NOT match '/', so a path slash
    # terminates the match and its tail survives to C8 — replicated here.
    ("go http://a-b.c%2Fx end", "go end"),
    ("ftp://files.example.org stop", "stop"),
    ("see https://h.io/p%2Fq done", "see p2Fq done"),
    # C6: bare jamo runs
    ("ㅋㅋㅋ 좋아요 ㅠㅠ", "좋아요"),
    # C7: 3+ repeats collapse to 2 (ascii + hangul + digits)
    ("aaaa bb cccc1111", "aa bb cc11"),
    # C8: punctuation/symbols dropped, hangul syllables kept
    ("한글! English? 123...", "한글 English 123"),
    # C9: whitespace collapse incl tabs/newlines
    ("a\t\tb\n\nc", "a b c"),
    ("", ""),
    ("   ", ""),
]


@pytest.mark.parametrize("raw,expected", REFERENCE_GOLDENS + EXTENDED_GOLDENS)
def test_clean_text_goldens(raw, expected):
    assert clean_text(raw) == expected


def test_clean_matches_reference_implementation():
    """Run the reference's own remove_special_characters logic (inlined
    here as an independent oracle, from preprocessor.py:147-212) over fuzz
    inputs and require byte equality."""
    import re

    def reference_clean(sentence):
        sentence = sentence.strip()
        sentence = re.sub("<[^>]*>", "", sentence)
        sentence = re.sub("([a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z0-9-.]+)", "", sentence)
        sentence = re.sub("(http|ftp|https)://(?:[-\\w.]|(?:%[\\da-fA-F]{2}))+", "", sentence)
        sentence = re.sub(r"\<[^>]*\>", "", sentence)
        sentence = re.sub("([ㄱ-ㅎㅏ-ㅣ]+)", "", sentence)
        p = re.compile("(([a-zA-Z0-9가-힣])\\2{2,})")
        for r, _ in p.findall(sentence):
            sentence = sentence.replace(r, r[:2])
        sentence = re.sub(r"[^가-힣0-9a-zA-Z\s]", "", sentence)
        sentence = " ".join(sentence.split())
        return sentence

    fuzz = [
        "aAaAaa <b>x</b> zzzz@q.c http://x.y 가가가가 ㅏㅏ %%%  nb",
        "<a href='http://e.com/%2F'>link</a> tail",
        "x" * 500 + "!@#",
        "한국어 문장 테스트 12345 aaaa@bbb.cc",
        "(괄호) [대괄호] {중괄호} <꺽쇠>",
    ]
    for s in [g[0] for g in REFERENCE_GOLDENS] + fuzz:
        assert clean_text(s) == reference_clean(s), repr(s)


def test_vectorized_series_matches_scalar():
    inputs = [g[0] for g in REFERENCE_GOLDENS + EXTENDED_GOLDENS] + [None]
    out = _clean_series(pd.Series(inputs, dtype=object))
    for raw, got in zip(inputs, out):
        assert got == (clean_text(raw) if raw is not None else None)


def test_spark_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from sifter_mrc_search_engine_spark.functions.cleaning import clean_text_udf

    rows = [(i, raw) for i, (raw, _) in enumerate(REFERENCE_GOLDENS)]
    df = spark.createDataFrame(rows, "i int, raw string")
    got = {r["i"]: r["c"] for r in df.select("i", clean_text_udf(F.col("raw")).alias("c")).collect()}
    for i, (_, expected) in enumerate(REFERENCE_GOLDENS):
        assert got[i] == expected
