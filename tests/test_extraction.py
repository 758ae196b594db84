"""data_DOM nested-JSON extraction (FIXTURES.md §6): both reference shapes."""

import json

import pytest

from sifter_mrc_search_engine_spark.sources.extraction import (
    extract_dom_json_strings,
)

# shape 1: named_entity/#/content/#/sentence (reference test corpus,
# tests/lm_post_training/preprocessor_test.py:27)
NE_SCHEMA = (
    "named_entity array<struct<content: array<struct<sentence: string>>>>"
)


def ne_doc(groups):
    return json.dumps(
        {"named_entity": [
            {"content": [{"sentence": s} for s in g]} for g in groups
        ]}
    )


# shape 2: document/*/paragraph/#/form with metadata/topic condition
# (reference default, modules/main.py:63, :68-70)
DOC_SCHEMA = (
    "document array<struct<metadata: struct<topic: string>, "
    "paragraph: array<struct<form: string>>>>"
)


def doc_doc(articles):
    return json.dumps(
        {"document": [
            {"metadata": {"topic": t}, "paragraph": [{"form": s} for s in ss]}
            for t, ss in articles
        ]}
    )


def test_named_entity_shape_flattens_per_file(spark):
    files = [
        ne_doc([["a1", "a2"], ["a3"]]),
        ne_doc([["b1"], ["b2", "b3", "b4"]]),
    ]
    out = {
        r["article_id"]: r["sentences"]
        for r in extract_dom_json_strings(
            spark, files, ["named_entity", "#", "content", "#", "sentence"], NE_SCHEMA
        ).collect()
    }
    assert sorted(map(tuple, out.values())) == [
        ("a1", "a2", "a3"),
        ("b1", "b2", "b3", "b4"),
    ]


def test_document_star_shape_one_row_per_article(spark):
    files = [
        doc_doc([("스포츠", ["s1", "s2"]), ("정치", ["p1"])]),
        doc_doc([("스포츠", ["s3"])]),
    ]
    out = extract_dom_json_strings(
        spark, files, ["document", "*", "paragraph", "#", "form"], DOC_SCHEMA
    ).collect()
    assert sorted(tuple(r["sentences"]) for r in out) == [
        ("p1",), ("s1", "s2"), ("s3",)
    ]


def test_condition_filter_keeps_matching_topic_only(spark):
    # reference: keep only articles whose metadata/topic == '스포츠'
    # (extractor.py:119-127, main.py:122-126)
    files = [
        doc_doc([("스포츠", ["s1", "s2"]), ("정치", ["p1"]), ("스포츠", ["s3"])]),
    ]
    out = extract_dom_json_strings(
        spark,
        files,
        ["document", "*", "paragraph", "#", "form"],
        DOC_SCHEMA,
        condition={"path": ["metadata", "topic"], "value": "스포츠"},
    ).collect()
    assert sorted(tuple(r["sentences"]) for r in out) == [("s1", "s2"), ("s3",)]


def test_article_ids_stable_under_repartition(spark):
    """article_id derives from content hashes, not
    monotonically_increasing_id: the same corpus at different partition
    layouts yields identical keys, so every downstream seeded draw (NSP
    coin/negative pick) is reproducible run to run."""
    import json as _json

    files = [ne_doc([[f"f{i} s{j}" for j in range(3)]]) for i in range(8)]
    dom = ["named_entity", "#", "content", "#", "sentence"]

    def run(parts):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(s,) for s in files], "js string").repartition(
            parts
        ).select(F.from_json("js", NE_SCHEMA).alias("root")).select("root.*")
        from sifter_mrc_search_engine_spark.sources.extraction import extract_dom

        return sorted(
            (r["article_id"], tuple(r["sentences"])) for r in extract_dom(df, dom).collect()
        )

    assert run(1) == run(7)


def test_sentence_splitter_rules():
    from sifter_mrc_search_engine_spark.functions.sentences import split_sentences

    assert split_sentences("첫 문장입니다. 둘째 문장이다! 셋째는요?") == [
        "첫 문장입니다.",
        "둘째 문장이다!",
        "셋째는요?",
    ]
    # decimals survive; terminator runs stay attached; tail w/o punct kept
    assert split_sentences("pi is 3.14 exactly. next part") == [
        "pi is 3.14 exactly.",
        "next part",
    ]
    assert split_sentences("really?! yes… ok") == ["really?!", "yes…", "ok"]
    assert split_sentences("") == []
    assert split_sentences(None) == []


def test_extract_dom_split_true(spark):
    """extractor.py:131-134: split=True explodes each extracted string
    into sentences before the per-article collect."""
    files = [ne_doc([["one sentence. two sentence.", "standalone"]])]
    dom = ["named_entity", "#", "content", "#", "sentence"]
    out = extract_dom_json_strings(spark, files, dom, NE_SCHEMA)
    plain = sorted(tuple(r["sentences"]) for r in out.collect())
    assert plain == [("one sentence. two sentence.", "standalone")]
    from sifter_mrc_search_engine_spark.sources.extraction import extract_dom
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in files], "js string").select(
        F.from_json("js", NE_SCHEMA).alias("root")
    ).select("root.*")
    split_out = sorted(
        tuple(r["sentences"]) for r in extract_dom(df, dom, split=True).collect()
    )
    assert split_out == [("one sentence.", "two sentence.", "standalone")]


def test_splitter_udf_matches_python(spark):
    from sifter_mrc_search_engine_spark.functions.sentences import (
        split_sentences,
        split_sentences_udf,
    )
    from pyspark.sql import functions as F

    texts = [
        "a b. c d! e?",
        "no punctuation at all",
        "tail… mixed?! done.",
        "숫자 3.14 보존. 다음 문장.",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {r["t"]: list(r["s"]) for r in df.select("t", split_sentences_udf("t").alias("s")).collect()}
    assert got == {t: split_sentences(t) for t in texts}
