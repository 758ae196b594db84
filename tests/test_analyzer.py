import pytest

from sifter_mrc_search_engine_spark.functions.analyzer import (
    analyze,
    rewrite_query,
    tokenize_expr,
    valid_parentheses,
    eliminate_final_postposition,
)


def test_analyze_basic():
    assert analyze("Spark FAST query") == ["spark", "fast", "query"]
    assert analyze("한국어 텍스트 test123 x") == ["한국어", "텍스트", "test123", "x"]
    assert analyze("!!! ...") == []
    assert analyze(None) == []


def test_rewrite_query_space_join():
    # search_functions.py:76-80 — analyzed terms rejoined with spaces
    assert rewrite_query("The Fast! Query?") == "the fast query"


def test_tokenize_expr_matches_python(spark):
    """JVM regexp_extract_all tokenization must equal the Python analyzer
    (the rank-identity contract depends on index/query self-consistency)."""
    samples = [
        "the fast key order sort",
        "Spark  FAST   query!!",
        "한국어 텍스트 123abc",
        "",
        "...",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, text string")
    got = {r["i"]: r["toks"] for r in df.select("i", tokenize_expr("text").alias("toks")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == analyze(s), s


# Cases shaped like the reference's vaild_parentheses tests
# (search_functions.py:24-44)
@pytest.mark.parametrize(
    "s,ok",
    [
        ("(a[b]{c})", True),
        ("(a[b)]", False),
        ("", True),
        ("((", False),
        ("x)", False),
        ("{[()]}", True),
    ],
)
def test_valid_parentheses(s, ok):
    assert valid_parentheses(s) is ok


def test_eliminate_final_postposition_with_tags():
    # simulated MeCab tags: strip trailing josa '는' (JX)
    assert eliminate_final_postposition("사과는", [("사과", "NNG"), ("는", "JX")]) == "사과"
    # SSC closer at the tail of a balanced sentence → break before stripping
    assert eliminate_final_postposition("(사과)", [("(", "SSO"), (")", "SSC")]) == "(사과)"
    # no tags → unchanged
    assert eliminate_final_postposition("사과는") == "사과는"


def test_fake_pos_tagger_whitelist_and_trim():
    """Exercise the MeCab-shaped code path (P5/C10/C11) with a
    deterministic fake tagger: the POS whitelist drives analysis
    (search_functions.py:13-22) and eliminate_final_postposition
    self-tags (search_functions.py:46-68)."""
    from sifter_mrc_search_engine_spark.functions.analyzer import (
        analyze,
        extract_pos,
        rewrite_query,
        set_pos_tagger,
    )

    TAGS = {
        "서울은": [("서울", "NNP"), ("은", "JX")],
        "어디에": [("어디", "NP"), ("에", "JKB")],
        "있나요": [("있", "VV"), ("나요", "EF")],
    }

    def fake_tagger(sentence):
        out = []
        for w in sentence.split():
            out.extend(TAGS.get(w, [(w, "NNG")]))
        return out

    set_pos_tagger(fake_tagger)
    try:
        # whitelist keeps NNP/VV/NNG, drops JX/NP/JKB/EF
        assert extract_pos("서울은 어디에 있나요") == ["서울", "있"]
        assert analyze("서울은 어디에 있나요") == ["서울", "있"]
        assert rewrite_query("서울은 어디에 있나요") == "서울 있"
        # C11: trailing josa stripped right-to-left via the installed tagger
        assert eliminate_final_postposition("서울은") == "서울"
        # trailing EF ending stripped
        assert eliminate_final_postposition("있나요") == "있"
    finally:
        set_pos_tagger(None)
    # restored default backend
    assert analyze("the Quick fox") == ["the", "quick", "fox"]


def test_make_analyze_udf_ships_installed_backend(spark):
    """A driver-installed tagger must reach executors: make_analyze_udf
    captures the backend by value (the module-global UDF cannot — fresh
    executor imports see the default backend)."""
    from pyspark.sql import functions as F

    from sifter_mrc_search_engine_spark.functions.analyzer import (
        make_analyze_udf,
        set_pos_tagger,
    )

    def shouty_tagger(sentence):
        # keep only words tagged NNG == words longer than 3 chars
        return [(w, "NNG" if len(w) > 3 else "JX") for w in sentence.split()]

    df = spark.createDataFrame([("the quick brown fox ran",)], "t string")
    set_pos_tagger(shouty_tagger)
    try:
        bound = make_analyze_udf()
        got = df.select(bound(F.col("t")).alias("toks")).collect()[0]["toks"]
        assert got == ["quick", "brown"]  # whitelist applied ON EXECUTORS
    finally:
        set_pos_tagger(None)
    # default UDF path unchanged after restore
    fresh = make_analyze_udf()
    got = df.select(fresh(F.col("t")).alias("toks")).collect()[0]["toks"]
    assert got == ["the", "quick", "brown", "fox", "ran"]
