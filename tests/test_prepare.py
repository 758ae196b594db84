"""Corpus-preparation pipeline composition."""

from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus


def test_prepare_corpus_stages(spark):
    rows = [
        (0, "the good long document with many proper words inside"),
        (1, "the good long document with many proper words inside"),  # exact dup
        (2, "short"),  # fails quality (length < 10)
        (3, "!!!! ???? ....::::;;;; @@@@ #### $$$$ %%%% ^^^^"),  # alnum ratio
        (4, "another quality document of the corpus with the words"),
        (5, "the good long document with many proper words inside extra"),  # near-dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clean, audit = prepare_corpus(docs, near_dup=True)
    a = audit.collect()[0]
    assert a["input"] == 6
    assert a["after_quality"] == 4  # 2 and 3 dropped
    assert a["after_exact_dedup"] == 3  # 1 dropped (dup of 0)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert 0 in kept and 4 in kept
    assert 1 not in kept and 2 not in kept and 3 not in kept
    # near-dup: 5 shares most 3-shingles with 0 -> LSH should pair them
    assert a["after_near_dedup"] <= a["after_exact_dedup"]


def test_prepare_with_html_and_lang(spark):
    rows = [
        (0, b"<p>the quick document of the day with words</p>"),
        (1, b"<div>der hund und die katze sind nicht da ein tag</div>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html binary")
    clean, audit = prepare_corpus(docs, html_col="html", lang="en")
    kept = [r["doc_id"] for r in clean.collect()]
    assert kept == [0]
    texts = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert texts[0] == "the quick document of the day with words"
